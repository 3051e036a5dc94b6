"""Sliding-window inference, MC sampling, and halo-exchange sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np

from prostatemr_3d_cad_cspca_tpu.infer import (
    _gaussian_importance,
    mc_predict,
    sliding_window_predict,
)
from prostatemr_3d_cad_cspca_tpu.parallel.halo import (
    halo_exchange,
    make_spatial_predict,
    receptive_margin,
)
from prostatemr_3d_cad_cspca_tpu.parallel.mesh import make_mesh


import pytest

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

def test_sliding_window_identity_reconstructs():
    vol = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 32, 32, 3)), jnp.float32)
    out = sliding_window_predict(lambda t: t, vol, window=(4, 16, 16), overlap=0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), atol=1e-5)


def test_gaussian_importance_peak_at_center():
    w = _gaussian_importance((5, 9, 9))
    assert w[2, 4, 4] == w.max() == 1.0
    assert w[0, 0, 0] < 0.1


def test_mc_predict_mean_std():
    def detect(params, x, rng=None):
        return x + jax.random.normal(rng, x.shape)

    x = jnp.zeros((1, 2, 4, 4, 1))
    mean, std = mc_predict(detect, None, x, jax.random.PRNGKey(0),
                           num_samples=32, reduce="mean_std")
    assert abs(float(mean.mean())) < 0.2
    assert 0.7 < float(std.mean()) < 1.3


def test_mc_predict_scan_matches_vmap():
    """scan_samples=True (round 5 — the compile-helper-friendly MC form)
    draws the SAME per-key samples as the vmap form: identical split keys
    feed the same single-draw body, only the iteration scheme differs."""
    def detect(params, x, rng=None):
        return x + jax.random.normal(rng, x.shape)

    x = jnp.zeros((2, 2, 4, 4, 1))
    key = jax.random.PRNGKey(7)
    sv = mc_predict(detect, None, x, key, num_samples=4, reduce=None)
    ss = mc_predict(detect, None, x, key, num_samples=4, reduce=None,
                    scan_samples=True)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sv), atol=1e-6)
    mv, sdv = mc_predict(detect, None, x, key, num_samples=4,
                         reduce="mean_std")
    ms, sds = mc_predict(detect, None, x, key, num_samples=4,
                         reduce="mean_std", scan_samples=True)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(mv), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sds), np.asarray(sdv), atol=1e-6)


def test_halo_exchange_reconstructs_neighbors():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=1, n_spatial=8)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(1, 32, 1)  # (B, H, C)

    def local(x_loc):
        return halo_exchange(x_loc, halo=2, axis_name="spatial", spatial_axis=1)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, "spatial", None),),
                   out_specs=P(None, "spatial", None), check_vma=False)
    out = np.asarray(fn(x))  # (1, 8*(4+4), 1): each shard padded by 2+2
    # shard 1 (devices hold 4 rows each): padded block = rows [2..9]
    blk1 = out[0, 8:16, 0]
    np.testing.assert_array_equal(blk1, np.arange(2, 10, dtype=np.float32))
    # boundary shard 0 zero-fills its outer halo (SAME-conv padding parity)
    blk0 = out[0, 0:8, 0]
    np.testing.assert_array_equal(blk0[:2], [0.0, 0.0])


def test_spatial_predict_matches_single_device_conv():
    """A local average-pool-like conv with halo sharding must equal the
    unsharded result away from (and at) shard boundaries."""
    mesh = make_mesh(n_data=1, n_spatial=4)
    kernel = jnp.ones((1, 3, 3, 1, 1), jnp.float32) / 9.0

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    vol = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 2, 32, 8, 1)), jnp.float32)
    fn = make_spatial_predict(conv, mesh, halo=2, spatial_axis=2)
    got = np.asarray(fn(vol))
    want = np.asarray(conv(vol))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_receptive_margin_positive():
    m = receptive_margin(
        ((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        ((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        spatial_dim=1)
    assert m > 10


def test_tensor_parallel_train_step():
    """DP+TP mesh (data=4, model=2): wide conv kernels sharded over 'model',
    training step runs and matches the replicated result's loss."""
    from prostatemr_3d_cad_cspca_tpu.models import M1
    from prostatemr_3d_cad_cspca_tpu.parallel.sharding import (
        param_partition_spec, state_shardings)
    from prostatemr_3d_cad_cspca_tpu.train.trainer import (
        init_train_state, make_loss, make_optimizer, make_train_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    KW = dict(
        input_spatial_dims=(4, 16, 16), input_channels=3, num_classes=2,
        filters=(4, 8, 16, 32, 128),  # widest stage shardable over model=2
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2),
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        dropout_rate=0.0, summary=False, seed=11,
    )
    rng = np.random.default_rng(3)
    lab = np.zeros((4, 4, 16, 16), np.int64)
    lab[:, 1:3, 4:10, 4:10] = 1
    batch_np = {
        "image": jnp.asarray(rng.normal(size=(4, 4, 16, 16, 3)), jnp.float32),
        "detection": jnp.asarray(np.eye(2, dtype=np.float32)[lab]),
    }

    losses = {}
    for tag, (n_data, n_model) in (("dp", (4, 1)), ("dp_tp", (4, 2))):
        model = M1(**KW)
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=jax.devices()[: n_data * n_model])
        opt = make_optimizer("momentum", 1e-3)
        step = make_train_step(
            model, make_loss("distribution_focal"), opt, mesh=mesh)
        state = init_train_state(model, opt)
        if n_model > 1:
            sh = state_shardings(state, mesh, min_channels=64)
            state = jax.device_put(state, sh)
            # at least one kernel is actually sharded over 'model'
            specs = param_partition_spec(state.params, min_channels=64)
            assert any("model" in str(s) for s in jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(str, specs)))
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        batch = jax.device_put(batch_np, NamedSharding(mesh, P("data")))
        state, m = step(state, batch, jax.random.PRNGKey(2))
        losses[tag] = float(jax.device_get(m["loss"]))
    np.testing.assert_allclose(losses["dp"], losses["dp_tp"], rtol=1e-4)


def test_spatial_infer_full_m1_matches_unsharded():
    """Whole-volume halo-sharded M1 inference is EXACT vs unsharded: convs via
    input halos, instance norms and SE squeezes via core-masked cross-shard
    statistics (ops.normalization.ShardedStats). Float tolerance only."""
    from prostatemr_3d_cad_cspca_tpu.models import M1
    from prostatemr_3d_cad_cspca_tpu.parallel.halo import spatial_infer_m1

    model = M1(
        input_spatial_dims=(4, 320, 16), input_channels=3, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 1, 1)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2),
        att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        dropout_rate=0.0, summary=False)
    mesh = make_mesh(n_data=1, n_spatial=4)
    vol = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 4, 320, 16, 3)), jnp.float32)

    sharded = np.asarray(spatial_infer_m1(model, model.params, vol, mesh))
    unsharded = np.asarray(model.apply(model.params, vol)["y_softmax"])
    assert sharded.shape == unsharded.shape
    assert np.all(np.isfinite(sharded))
    np.testing.assert_allclose(sharded, unsharded, atol=1e-5)
    assert np.mean(
        np.argmax(sharded, -1) == np.argmax(unsharded, -1)) > 0.9999


def test_chunked_batch_fn_matches_direct():
    """make_chunked_batch_fn: one scan-chunked program equals the direct
    batched apply (the cfg1 fixed-cost amortization lever, round 4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from prostatemr_3d_cad_cspca_tpu.infer import make_chunked_batch_fn

    def apply_fn(x):  # stand-in network: nonlinear + channel mix
        return {"y": jnp.tanh(x @ jnp.full((3, 2), 0.5, x.dtype)) + x[..., :2]}

    x = jnp.asarray(np.random.default_rng(0).normal(size=(12, 4, 6, 6, 3)),
                    jnp.float32)
    direct = apply_fn(x)["y"]
    chunked = make_chunked_batch_fn(apply_fn, chunk=3, n_chunks=4)(x)["y"]
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(direct),
                               rtol=1e-6)
