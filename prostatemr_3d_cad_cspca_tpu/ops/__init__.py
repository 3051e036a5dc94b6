"""Core tensor ops: convolution configs, normalization, resampling, distributions.

Everything in here is pure-functional JAX (NDHWC layouts, static shapes,
fp32 statistics under mixed precision) and is safe to use under jit/pjit.
"""

from .convolution import ConvConfig, default_conv_config  # noqa: F401
from .normalization import InstanceNorm, instance_norm  # noqa: F401
from .resample import upsample_nearest, resize_bilinear_2d  # noqa: F401
from .distributions import DiagGaussian, kl_diag_gaussians  # noqa: F401
