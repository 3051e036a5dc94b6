"""One-program sliding window (infer.make_sliding_window_fn) equals the
eager tile loop (infer.sliding_window_predict) — gather, predict, Gaussian
blend, including the zero-weight padding tiles when the tile count doesn't
divide the batch size."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prostatemr_3d_cad_cspca_tpu.infer import (
    make_sliding_window_fn,
    sliding_window_predict,
)


def _predict(x):
    # cheap stand-in network: nonlinear, channel-mixing, shape-preserving
    a = jnp.tanh(x * 0.7 + 0.1)
    return jnp.stack([a.sum(-1), (a ** 2).sum(-1)], axis=-1)


@pytest.mark.parametrize("full,window,overlap,bs", [
    ((8, 24, 24), (4, 16, 16), 0.5, 4),
    ((8, 24, 24), (4, 16, 16), 0.25, 3),   # pad path: 8 tiles, bs=3
    ((4, 16, 16), (4, 16, 16), 0.5, 2),    # single tile
    ((10, 20, 28), (4, 16, 16), 0.4, 5),
])
def test_jit_matches_eager(full, window, overlap, bs):
    vol = jnp.asarray(
        np.random.default_rng(0).normal(size=(*full, 3)), jnp.float32)
    eager = sliding_window_predict(
        _predict, vol, window=window, overlap=overlap, batch_size=bs)
    run = make_sliding_window_fn(
        _predict, full_spatial=full, window=window, in_channels=3,
        out_channels=2, overlap=overlap, batch_size=bs)
    fused = run(vol)
    assert fused.shape == (*full, 2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(eager),
                               atol=1e-5, rtol=1e-5)


def test_multi_case_batch_matches_single():
    """cases=K vmaps the whole program; per-case outputs equal the
    single-case run (the K-case program amortizes the fixed per-program
    device cost — docs/ROUND3_NOTES.md)."""
    full, window = (8, 24, 24), (4, 16, 16)
    rng = np.random.default_rng(2)
    vols = jnp.asarray(rng.normal(size=(3, *full, 3)), jnp.float32)
    single = make_sliding_window_fn(
        _predict, full_spatial=full, window=window, in_channels=3,
        out_channels=2, overlap=0.5, batch_size=4)
    batched = make_sliding_window_fn(
        _predict, full_spatial=full, window=window, in_channels=3,
        out_channels=2, overlap=0.5, batch_size=4, cases=3)
    out = batched(vols)
    assert out.shape == (3, *full, 2)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out[i]),
                                   np.asarray(single(vols[i])),
                                   atol=1e-5, rtol=1e-5)


def test_multi_case_mesh_sharded_matches_single():
    """cases=K with mesh: the case axis shards over the mesh's data
    dimension and outputs equal the unsharded program (whole-gland serving
    scale-out across a slice)."""
    from prostatemr_3d_cad_cspca_tpu.parallel.mesh import make_mesh

    full, window = (8, 24, 24), (4, 16, 16)
    rng = np.random.default_rng(5)
    vols = jnp.asarray(rng.normal(size=(4, *full, 3)), jnp.float32)
    kw = dict(full_spatial=full, window=window, in_channels=3,
              out_channels=2, overlap=0.5, batch_size=4, cases=4)
    plain = make_sliding_window_fn(_predict, **kw)
    sharded = make_sliding_window_fn(_predict, mesh=make_mesh(n_data=4), **kw)
    np.testing.assert_allclose(np.asarray(sharded(vols)),
                               np.asarray(plain(vols)),
                               atol=1e-5, rtol=1e-5)


def test_no_gaussian_weights():
    full, window = (6, 20, 20), (4, 16, 16)
    vol = jnp.asarray(
        np.random.default_rng(1).normal(size=(*full, 2)), jnp.float32)
    f = lambda x: x * 2.0  # noqa: E731
    eager = sliding_window_predict(f, vol, window=window, overlap=0.5,
                                   batch_size=2, gaussian_weights=False)
    run = make_sliding_window_fn(f, full, window, 2, 2, overlap=0.5,
                                 batch_size=2, gaussian_weights=False)
    np.testing.assert_allclose(np.asarray(run(vol)), np.asarray(eager),
                               atol=1e-5)
    # uniform weights over a covering tiling reproduce the input * 2
    np.testing.assert_allclose(np.asarray(run(vol)), np.asarray(vol) * 2.0,
                               atol=1e-5)
