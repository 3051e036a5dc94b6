"""Analytic FLOP counting from jaxprs (convs + matmuls).

Used by bench.py to publish an MFU / roofline figure next to the headline
volumes/sec (VERDICT.md round-2 item 2: "BENCH publishes an MFU/roofline
figure alongside vol/s"). Counts 2*MACs for ``conv_general_dilated`` and
``dot_general`` recursively through nested jaxprs (pjit/remat/scan bodies
are counted once per trace — multiply by trip counts outside if needed).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _conv_flops(eqn) -> int:
    out_shape = eqn.outvars[0].aval.shape
    rhs_shape = eqn.invars[1].aval.shape
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1) or 1)
    # rhs_spec: (out_c_dim, in_c_dim, *spatial_dims) as indices into rhs
    in_c = rhs_shape[dn.rhs_spec[1]]
    kernel_spatial = _prod(rhs_shape[d] for d in dn.rhs_spec[2:])
    return 2 * _prod(out_shape) * in_c * kernel_spatial  # in_c already /groups


def _dot_flops(eqn) -> int:
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    contract = _prod(lhs[d] for d in lc)
    batch = _prod(lhs[d] for d in lb)
    m = _prod(lhs[d] for d in range(len(lhs)) if d not in set(lc) | set(lb))
    n = _prod(rhs[d] for d in range(len(rhs)) if d not in set(rc) | set(rb))
    return 2 * batch * m * n * contract


def _jaxpr_flops(jaxpr) -> int:
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "dot_general":
            total += _dot_flops(eqn)
        else:
            for p in eqn.params.values():
                vals = p if isinstance(p, (list, tuple)) else (p,)
                for v in vals:
                    if isinstance(v, jax.extend.core.ClosedJaxpr):
                        total += _jaxpr_flops(v.jaxpr)
                    elif hasattr(v, "eqns"):  # raw Jaxpr
                        total += _jaxpr_flops(v)
    return total


def count_matmul_flops(fn, *args, **kwargs) -> int:
    """Total conv+dot FLOPs (2*MACs) of one call of ``fn(*args)``."""
    closed = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return _jaxpr_flops(closed.jaxpr)


def logical_io_bytes(*arrays) -> int:
    """Sum of array sizes in bytes (for roofline IO estimates)."""
    return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrays)
