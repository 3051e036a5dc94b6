"""Training-step tests: loss decreases, 1-vs-N-device equivalence
(SURVEY.md §4's distributed contract), resume semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.parallel.mesh import make_mesh
from prostatemr_3d_cad_cspca_tpu.train.trainer import (
    init_train_state,
    make_loss,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

SPATIAL = (4, 16, 16)
KW = dict(
    input_spatial_dims=SPATIAL, input_channels=3, num_classes=2,
    filters=(4, 8, 12, 16, 24),
    strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2)),
    kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
    se_reduction=(2, 2, 2, 2, 2),
    att_sub_samp=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
    dropout_rate=0.0, summary=False,
)


def _batch(n=8, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(n, *SPATIAL, 3)).astype(np.float32)
    lab = np.zeros((n, *SPATIAL), np.int64)
    lab[:, 1:3, 4:10, 4:10] = 1
    det = np.eye(2, dtype=np.float32)[lab]
    # make the image informative about the label
    img[..., 0] += det[..., 1] * 2.0
    return {"image": jnp.asarray(img), "detection": jnp.asarray(det)}


def test_loss_decreases_single_device():
    model = M1(**KW)
    opt = make_optimizer("adam", 1e-3)
    step = make_train_step(model, make_loss("distribution_focal"), opt)
    state = init_train_state(model, opt)
    batch = _batch()
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(6):
        rng, k = jax.random.split(rng)
        state, m = step(state, batch, k)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))


def test_one_vs_eight_device_loss_equivalence():
    """Same batch + rng on a 1-device and an 8-device mesh: identical loss
    trajectory and identical global update magnitude.

    Raw per-leaf param comparison is NOT meaningful here: gradients of
    bias-like params accumulate +/-1e4 terms that cancel to ~1e1, so fp32
    cross-shard reduction order alone perturbs them at the 1e-2 level
    (verified empirically — losses stay bit-identical). The failure modes
    this test guards against (missing/duplicated gradient psum, sharded
    batch mis-split) shift the loss trajectory and scale the update norm
    ~8x, far above these tolerances.
    """
    results = {}
    for n in (1, 8):
        model = M1(seed=42, **KW)
        mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
        opt = make_optimizer("momentum", 1e-3)
        step = make_train_step(model, make_loss("distribution_focal"), opt, mesh=mesh)
        state = init_train_state(model, opt)
        p0 = jax.device_get(state.params)
        batch = jax.device_put(_batch(), NamedSharding(mesh, P("data")))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        losses = []
        rng = jax.random.PRNGKey(1)
        for _ in range(2):
            rng, k = jax.random.split(rng)
            state, m = step(state, batch, k)
            losses.append(float(jax.device_get(m["loss"])))
        p1 = jax.device_get(state.params)
        upd_sq = sum(
            float(np.sum(np.square(a - b)))
            for a, b in zip(jax.tree_util.tree_leaves(p0),
                            jax.tree_util.tree_leaves(p1)))
        results[n] = (losses, np.sqrt(upd_sq))
    # step 1 is computed from identical params: must match to fp32 exactness;
    # step 2 sits on chaotically-amplified step-1 noise: order-of-magnitude.
    np.testing.assert_allclose(results[1][0][0], results[8][0][0], rtol=1e-5)
    np.testing.assert_allclose(results[1][0][1], results[8][0][1], rtol=3e-2)
    np.testing.assert_allclose(results[1][1], results[8][1], rtol=3e-2)


def test_probabilistic_train_step_finite_kl():
    model = M1(probabilistic=True, prob_latent_dims=(2, 1, 0, 0),
               dropout_mode="monte-carlo",
               **{**KW, "input_channels": 4, "dropout_rate": 0.5})
    opt = make_optimizer("adam", 1e-3)
    step = make_train_step(model, make_loss("distribution_focal"), opt,
                           elbo_beta=10.0)
    state = init_train_state(model, opt)
    b = _batch()
    batch = {"image": jnp.concatenate([b["image"], b["detection"][..., 1:]], -1),
             "detection": b["detection"]}
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert float(m["kl"]) >= 0.0


def test_fused_augment_train_step():
    """Augmentation fused into the jitted step: loss finite, labels stay
    one-hot after the geometric transforms, state advances."""
    from prostatemr_3d_cad_cspca_tpu.augment import AugmentParams

    model = M1(**KW)
    opt = make_optimizer("adam", 1e-3)
    step = make_train_step(
        model, make_loss("distribution_focal"), opt,
        augment_params=AugmentParams(), train_obj="lesion")
    state = init_train_state(model, opt)
    batch = _batch(n=2)
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_scan_steps_matches_sequential():
    """The K-step scan program (VERDICT r3 item 2) is semantically K single
    steps: same per-step RNG keys => same loss trajectory and same final
    params (fp32 tolerance)."""
    K = 3
    rng = jax.random.PRNGKey(7)
    keys = jax.random.split(rng, K)
    chunk = [_batch(n=2, seed=i) for i in range(K)]

    model_a = M1(seed=3, **KW)
    opt = make_optimizer("adam", 1e-3)
    step = make_train_step(model_a, make_loss("distribution_focal"), opt)
    state_a = init_train_state(model_a, opt)
    seq_losses = []
    for i in range(K):
        state_a, m = step(state_a, chunk[i], keys[i])
        seq_losses.append(float(m["loss"]))

    model_b = M1(seed=3, **KW)
    multi = make_train_step(model_b, make_loss("distribution_focal"),
                            opt, scan_steps=K)
    state_b = init_train_state(model_b, opt)
    batches = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *chunk)
    state_b, m = multi(state_b, batches, rng)

    np.testing.assert_allclose(np.asarray(m["loss"]), seq_losses, rtol=1e-5)
    assert int(state_b.step) == K
    # Per-leaf param equality is NOT meaningful here (see the 1-vs-8-device
    # test above: fp32 reduction-order noise through Adam perturbs bias-like
    # leaves at the 1e-3 level while losses stay equal). Compare the global
    # parameter vector norm instead — a wrong scan semantics (skipped step,
    # reused batch, stale opt state) shifts it at the 1e-1 level.
    na = np.sqrt(sum(float(np.sum(np.square(l))) for l in
                     jax.tree_util.tree_leaves(jax.device_get(state_a.params))))
    nb = np.sqrt(sum(float(np.sum(np.square(l))) for l in
                     jax.tree_util.tree_leaves(jax.device_get(state_b.params))))
    np.testing.assert_allclose(na, nb, rtol=1e-4)


def test_scan_steps_sharded_mesh():
    """Multi-step scan over a data-sharded mesh: batches carry (K, B, ...)
    with B sharded over 'data'; the program compiles and the loss is finite."""
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])
    model = M1(**KW)
    opt = make_optimizer("adam", 1e-3)
    multi = make_train_step(model, make_loss("distribution_focal"), opt,
                            mesh=mesh, scan_steps=2)
    state = init_train_state(model, opt)
    chunk = [_batch(n=8, seed=i) for i in range(2)]
    batches = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *chunk)
    state, m = multi(state, batches, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(m["loss"])))
    assert int(state.step) == 2


def test_fit_scan_steps():
    """fit(scan_steps=K) trains via the multi-step program and records one
    metric entry per step; non-divisor K raises constructively."""
    from prostatemr_3d_cad_cspca_tpu.train.trainer import fit

    model = M1(**KW)

    def gen():
        i = 0
        while True:
            yield _batch(n=2, seed=i)
            i += 1

    hist = fit(model, gen(), epochs=1, steps_per_epoch=4, scan_steps=2,
               verbose=0)
    assert np.isfinite(hist["loss"][0])

    with pytest.raises(ValueError, match="scan_steps"):
        fit(model, gen(), epochs=1, steps_per_epoch=5, scan_steps=2, verbose=0)


def test_accum_steps_matches_single_step_on_identical_microbatches():
    """Gradient accumulation (VERDICT r4 item 3): with K identical
    microbatches and a deterministic model (no dropout/latent), the
    averaged grad equals the plain step's grad up to compile-order fp
    noise ((g+g)/2 == g; scan vs inline fusion reorders reductions).
    Param equivalence is checked through SGD — linear in the gradient,
    so 1e-7-scale grad noise stays 1e-7-scale in the params. (Adam's
    step-1 update is ~lr*sign(g): the same noise flips signs of
    near-zero grads and produces O(lr) param diffs by construction, so
    it cannot discriminate an accumulation bug from fp reordering.)"""
    K = 2
    batch = _batch(n=2, seed=0)
    rng = jax.random.PRNGKey(7)

    model_a = M1(seed=3, **KW)
    opt = make_optimizer("sgd", 1e-2)
    step = make_train_step(model_a, make_loss("distribution_focal"), opt)
    state_a = init_train_state(model_a, opt)
    state_a, m_a = step(state_a, batch, rng)

    model_b = M1(seed=3, **KW)
    accum = make_train_step(model_b, make_loss("distribution_focal"), opt,
                            accum_steps=K)
    state_b = init_train_state(model_b, opt)
    batches = jax.tree_util.tree_map(lambda b: jnp.stack([b] * K), batch)
    state_b, m_b = accum(state_b, batches, rng)

    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-5)
    assert int(state_b.step) == 1  # ONE optimizer update for K microbatches
    for la, lb in zip(jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
                      jax.tree_util.tree_leaves(jax.device_get(state_b.params))):
        np.testing.assert_allclose(lb, la, rtol=1e-4, atol=1e-6)


def test_accum_steps_sharded_mesh_and_exclusivity():
    """Accumulation over a data-sharded mesh compiles and runs; combining
    scan_steps with accum_steps raises."""
    mesh = make_mesh(n_data=8, devices=jax.devices()[:8])
    model = M1(**KW)
    opt = make_optimizer("adam", 1e-3)
    accum = make_train_step(model, make_loss("distribution_focal"), opt,
                            mesh=mesh, accum_steps=2)
    state = init_train_state(model, opt)
    chunk = [_batch(n=8, seed=i) for i in range(2)]
    batches = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *chunk)
    state, m = accum(state, batches, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1

    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(model, make_loss("distribution_focal"), opt,
                        scan_steps=2, accum_steps=2)
