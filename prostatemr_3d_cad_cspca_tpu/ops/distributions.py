"""Per-voxel diagonal-Gaussian latent distributions with closed-form KL.

Replaces ``tfp.distributions.MultivariateNormalDiag`` in the reference's
hierarchical probabilistic ladder (networks.py:540-543, 642, 373-379).
Event dim is the trailing (latent) axis; batch shape is (B, D, H, W).

The reference clips log-sigma to [-0.1, 0.1] before exponentiating to prevent
KL divergence blow-up (networks.py:540, citing y0ast/VAE-Torch#3); the same
clip lives in ``DiagGaussian.from_mu_logsigma``.

Sampling is explicit reparameterization with a caller-supplied PRNG key — the
JAX-native replacement for TF's implicit global RNG.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

LOGSIG_CLIP = 0.1


class DiagGaussian(NamedTuple):
    """loc/scale per voxel; event shape = trailing axis."""

    loc: jax.Array    # (..., latent_dim)
    scale: jax.Array  # (..., latent_dim), strictly positive

    @classmethod
    def from_mu_logsigma(cls, mu: jax.Array, logsigma: jax.Array) -> "DiagGaussian":
        scale = jnp.exp(jnp.clip(logsigma, -LOGSIG_CLIP, LOGSIG_CLIP))
        return cls(loc=mu, scale=scale)

    def sample(self, key: jax.Array) -> jax.Array:
        eps = jax.random.normal(key, self.loc.shape, dtype=jnp.float32)
        return self.loc + self.scale * eps.astype(self.loc.dtype)

    @property
    def mean(self) -> jax.Array:
        return self.loc


def kl_diag_gaussians(q: DiagGaussian, p: DiagGaussian) -> jax.Array:
    """KL(q || p) summed over the event (latent) axis.

    Closed form per dim: log(sp/sq) + (sq^2 + (mq-mp)^2) / (2 sp^2) - 1/2.
    Returns shape = batch shape (B, D, H, W), matching
    ``tfp.distributions.kl_divergence`` on MultivariateNormalDiag
    (reference: networks.py:375).

    Computed in fp32 regardless of input dtype — the per-voxel KL is summed
    over ~5e5 voxels downstream, so bf16 accumulation is not acceptable.
    """
    qloc = q.loc.astype(jnp.float32)
    qsc = q.scale.astype(jnp.float32)
    ploc = p.loc.astype(jnp.float32)
    psc = p.scale.astype(jnp.float32)
    var_ratio = jnp.square(qsc / psc)
    t1 = jnp.square((qloc - ploc) / psc)
    kl_per_dim = 0.5 * (var_ratio + t1 - 1.0) - jnp.log(qsc / psc)
    return jnp.sum(kl_per_dim, axis=-1)
