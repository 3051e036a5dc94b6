"""Spatially-sharded TRAINING (parallel/halo.py::make_spatial_train_step).

The long-context-training analogue: a full-resolution volume slab-sharded
over the mesh trains as one SPMD program. Contracts checked:

1. Full M1: the sharded LOSS equals the unsharded single-device step to
   float tolerance — input halos make convs voxel-exact, cross-shard IN/SE
   statistics reproduce the unsharded reduction set, and core-masked
   per-sample sums + psum reproduce the unsharded loss reduction.
2. Gradient exactness is pinned on a conv + sharded-IN + SE-gate stack
   (every cross-device coupling the step uses: ppermute halo exchange,
   core-masked psum statistics, psum'd squeeze): sharded grads equal the
   unsharded autodiff to float tolerance.

For the full deep M1 the per-leaf gradient comparison is numerically
ill-posed in fp32 — conv biases feeding an instance norm have analytically
zero gradient (a uniform per-channel shift is removed by the
normalization) and autodiff computes them by catastrophic cancellation;
the unsharded function's own autodiff disagrees with its finite difference
there. make_spatial_train_step is exported as an experimental capability
with the loss contract guaranteed; see its docstring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from prostatemr_3d_cad_cspca_tpu.losses import Focal
from prostatemr_3d_cad_cspca_tpu.models import M1
from prostatemr_3d_cad_cspca_tpu.ops.normalization import (
    ShardedStats, global_spatial_mean, instance_norm)
from prostatemr_3d_cad_cspca_tpu.parallel.halo import (
    halo_exchange, make_spatial_train_step)
from prostatemr_3d_cad_cspca_tpu.parallel.mesh import make_mesh


import pytest

pytestmark = pytest.mark.slow  # compile-heavy full-model tier

def test_spatial_train_step_loss_matches_unsharded():
    model = M1(
        input_spatial_dims=(4, 320, 16), input_channels=3, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 1, 1)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
        dropout_rate=0.0, summary=False)
    mesh = make_mesh(n_data=1, n_spatial=4)
    focal = Focal(alpha=(1.0, 1.0), gamma=2.0)
    tx = optax.sgd(1e-5)

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.normal(size=(1, 4, 320, 16, 3)), jnp.float32)
    blob = np.zeros((1, 4, 320, 16), np.float32)
    blob[:, 1:3, 100:220, 4:12] = 1.0
    lab = jnp.asarray(np.stack([1.0 - blob, blob], axis=-1), jnp.float32)

    def ref_loss(params):
        out = model.net.apply({"params": params}, img, train=True)
        return focal(lab, out["y_softmax"])

    ref_l = ref_loss(model.params)

    step = make_spatial_train_step(model, focal, tx, mesh, spatial_axis=2)
    sh_params, _, sh_l = step(model.params, tx.init(model.params), img, lab)
    np.testing.assert_allclose(float(sh_l), float(ref_l), rtol=1e-5)

    # the step really trains: a second step from the updated params lowers
    # the (full-volume) loss
    _, _, sh_l2 = step(sh_params, tx.init(sh_params), img, lab)
    assert float(sh_l2) < float(sh_l)


def test_sharded_gradients_exact_conv_in_se_stack():
    """Gradient exactness through every cross-device coupling the spatial
    train step uses: halo exchange (ppermute), core-masked IN statistics
    (psum), SE squeeze (psum'd global mean)."""
    mesh = make_mesh(n_data=1, n_spatial=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 64, 8, 3)), jnp.float32)
    params = {
        "w1": jnp.asarray(rng.normal(size=(1, 3, 3, 3, 6)) * 0.3, jnp.float32),
        "scale": jnp.asarray(rng.normal(size=(6,)) * 0.3 + 1, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(6,)) * 0.2, jnp.float32),
        "w6": jnp.asarray(rng.normal(size=(6, 3)) * 0.3, jnp.float32),
        "b6": jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32),
        "w7": jnp.asarray(rng.normal(size=(3, 6)) * 0.3, jnp.float32),
    }

    def net(p, v, sharded=None):
        h = jax.lax.conv_general_dilated(
            v, p["w1"], (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        h = instance_norm(h, p["scale"], p["bias"], sharded=sharded)
        g = global_spatial_mean(h, sharded).astype(h.dtype)
        s = jax.nn.sigmoid(jnp.einsum(
            "bdhwc,co->bdhwo",
            jax.nn.leaky_relu(
                jnp.einsum("bdhwc,co->bdhwo", g, p["w6"]) + p["b6"], 0.1),
            p["w7"]))
        return h * s

    def ref_loss(p):
        return jnp.sum(net(p, x)[..., :2] ** 2)

    rl, rg = jax.value_and_grad(ref_loss)(params)

    H = 4

    def local_loss(p, xl):
        pad = halo_exchange(xl, H, "spatial", 2)
        sh = ShardedStats(axis_name="spatial", spatial_axis=2, halo=H,
                          extent=pad.shape[2])
        out = net(p, pad, sh)
        return jnp.sum(out[:, :, H : pad.shape[2] - H][..., :2] ** 2)

    def local_grads(p, xl):
        l, g = jax.value_and_grad(local_loss)(p, xl)
        return jax.lax.psum(l, "spatial"), jax.lax.psum(g, "spatial")

    f = jax.jit(shard_map(
        local_grads, mesh=mesh, in_specs=(P(), P(None, None, "spatial")),
        out_specs=(P(), P()), check_vma=False))
    sl, sg = f(params, x)
    np.testing.assert_allclose(float(sl), float(rl), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(sg[k]), np.asarray(rg[k]), rtol=2e-4, atol=1e-4,
            err_msg=k)


def test_spatial_train_step_guards():
    """Constructive errors at build time (ADVICE r2 / VERDICT r2 item 10):
    active dropout and deep supervision break the exactness contract and
    must fail with explicit messages, not a flax trace error."""
    common = dict(
        input_spatial_dims=(4, 64, 16), input_channels=3, num_classes=2,
        filters=(4, 8, 12, 16, 24),
        strides=((1, 1, 1), (1, 2, 2), (1, 2, 2), (2, 2, 2), (1, 1, 1)),
        kernel_sizes=((1, 3, 3), (1, 3, 3), (3, 3, 3), (3, 3, 3), (3, 3, 3)),
        se_reduction=(2, 2, 2, 2, 2), att_sub_samp=((1, 1, 1),) * 4,
        summary=False, init_params=False)
    mesh = make_mesh(n_data=1, n_spatial=4)
    focal = Focal(alpha=(1.0, 1.0), gamma=2.0)
    tx = optax.sgd(1e-5)

    with pytest.raises(ValueError, match="dropout_rate=0"):
        make_spatial_train_step(
            M1(dropout_rate=0.5, **common), focal, tx, mesh)
    with pytest.raises(ValueError, match="deep_supervision"):
        make_spatial_train_step(
            M1(dropout_rate=0.0, deep_supervision=True, **common),
            focal, tx, mesh)
    with pytest.raises(ValueError, match="stand-alone deterministic"):
        make_spatial_train_step(
            M1(dropout_rate=0.0, probabilistic=True,
               prob_latent_dims=(2, 1, 1, 0), **common), focal, tx, mesh)
