"""Pallas TPU kernels for the memory-bound hot ops."""

from .fused_norm import fused_instance_norm_lrelu  # noqa: F401
