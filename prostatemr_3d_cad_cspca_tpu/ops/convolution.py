"""Convolution configuration shared by all network blocks.

The reference threads a single ``conv_params`` dict (padding='same',
orthogonal kernel init, truncated-normal bias init, L2 regularizers) through
every Conv3D/Conv3DTranspose (reference: tf2.5/scripts/model/unets/networks.py:456-460).
Here the same contract is a small dataclass:

  * initializers map 1:1 — ``jax.nn.initializers.orthogonal`` flattens all
    leading kernel dims exactly like ``tf.keras.initializers.Orthogonal``;
    ``truncated_normal`` truncates at +/-2 sigma in both frameworks.
  * L2 regularization is NOT baked into layers (a TF-ism); instead the
    coefficients live here and ``l2_penalty`` below folds the term into the
    training loss over the param pytree — same math
    (``l2 * sum(w**2)``), XLA-fusable, and zero cost at inference.
  * padding is always 'SAME' (XLA's SAME == TF's SAME for forward conv; for
    transposed conv both frameworks produce ``out = in * stride``).

TPU notes: all convs run in NDHWC; under mixed precision the params stay
fp32 and are cast at apply time (handled by the blocks, not here).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


Initializer = Callable[..., Any]


@dataclasses.dataclass(frozen=True)
class ConvConfig:
    """Shared convolution hyperparameters (reference conv_params dict)."""

    kernel_init: Initializer = nn.initializers.orthogonal(scale=1.0)
    bias_init: Initializer = nn.initializers.truncated_normal(stddev=0.001)
    kernel_l2: float = 1e-4
    bias_l2: float = 1e-4
    use_bias: bool = True
    # Compute dtype for conv outputs. None => infer from inputs (fp32 default).
    dtype: Any = None
    # Param storage dtype (keep fp32 even when computing in bf16).
    param_dtype: Any = jnp.float32

    def conv_kwargs(self):
        return dict(
            kernel_init=self.kernel_init,
            bias_init=self.bias_init,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            padding="SAME",
        )


def default_conv_config(**overrides) -> ConvConfig:
    return dataclasses.replace(ConvConfig(), **overrides)


def l2_penalty(params, kernel_l2: float, bias_l2: float) -> jax.Array:
    """L2 regularization term over a param pytree.

    Mirrors ``tf.keras.regularizers.l2`` attached to every conv kernel/bias in
    the reference (networks.py:47-48): ``l2 * sum(w ** 2)``. Instance-norm
    scale/bias params carry no regularizer in the reference (tfa default) and
    are excluded here by name.
    """
    total = jnp.zeros((), jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
        # The reference regularizes every conv EXCEPT the squeeze-excite 1x1x1
        # convs, which are built without conv_params (network_blocks.py:45-46);
        # instance-norm scale/bias are likewise unregularized (tfa defaults).
        if parent.startswith("norm") or parent.startswith("se_"):
            continue
        if name == "kernel":
            total = total + kernel_l2 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
        elif name == "bias":
            total = total + bias_l2 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total
