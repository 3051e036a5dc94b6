"""Import TF/Keras M1 weights into the Flax param tree.

The reference ships Keras H5 checkpoints (modelio.py:98-117). This module
maps a Keras deterministic-M1 layer graph (stem -> SE encoder -> attention
gates -> nested decoder -> logits, the reference build order
networks.py:472-526) onto this framework's param tree:

  * Conv3D            kernel (k,k,k,in,out), bias        -> Conv
  * Conv3DTranspose   kernel (k,k,k,out,in), bias        -> ConvTranspose
                      (transpose_kernel=True — same layout and operation,
                       verified in tests/test_tf_parity.py)
  * InstanceNorm      gamma/beta                          -> scale/bias

Primitive-level conventions (SAME padding, GN(groups=-1) statistics,
leaky-relu) are verified in tests/test_tf_parity.py; the end-to-end mapping
is exercised by tests/test_tf_parity.py::test_full_m1_forward_parity which
pushes identical weights through both frameworks and compares softmax
outputs voxel-for-voxel.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def flax_weight_order(dense_skip: bool = False) -> List[Tuple[str, str]]:
    """Ordered (path, kind) list for the deterministic M1 core, matching the
    reference's layer creation order. kind: conv | convT | norm."""

    def se(name):
        return [
            (f"{name}/conv1", "conv"), (f"{name}/norm1", "norm"),
            (f"{name}/conv2", "conv"), (f"{name}/norm2", "norm"),
            (f"{name}/conv3", "conv"), (f"{name}/norm3", "norm"),
            (f"{name}/conv4", "conv"), (f"{name}/norm4", "norm"),
            (f"{name}/se_conv6", "conv"), (f"{name}/se_conv7", "conv"),
        ]

    def att(name):
        return [
            (f"{name}/theta", "conv"), (f"{name}/phi", "conv"),
            (f"{name}/psi", "conv"), (f"{name}/out", "conv"),
            (f"{name}/norm_out", "norm"),
        ]

    order: List[Tuple[str, str]] = [("conve0", "conv"), ("norme0", "norm")]
    for i in (1, 2, 3, 4):
        order += se(f"serse{i}")
    for i in (0, 1, 2, 3):
        order += att(f"att{i}")
    order += [("convtd3", "convT")]
    if dense_skip:
        order += [("convtd3_up1", "convT"), ("convtd3_up2", "convT"),
                  ("convtd3_up3", "convT")]
    order += se("sersd3")
    order += [("convtd2", "convT")]
    if dense_skip:
        order += [("convtd2_up1", "convT"), ("convtd2_up2", "convT")]
    order += se("sersd2")
    order += [("convtd1", "convT")]
    if dense_skip:
        order += [("convtd1_up1", "convT")]
    order += se("sersd1")
    order += [("convtd0", "convT")]
    order += se("sersd0")
    order += [("logits", "conv")]
    return order


def import_keras_m1_weights(
    keras_layers, flax_params: Dict, root: str = "core",
    dense_skip: bool = False,
) -> Dict:
    """Copy weights from a Keras layer list into the flax tree, matched by
    layer NAME: each weighted Keras layer must be named with its flax param
    path using '.' separators (e.g. ``serse1.conv1``, ``att0.norm_out``) —
    Keras' ``model.layers`` is topologically ordered, so positional matching
    is not reliable. Returns a NEW params dict; every expected path must be
    present on both sides (the architectures must agree).
    """
    import copy

    params = copy.deepcopy(
        {k: v for k, v in _to_mutable(flax_params).items()})
    by_name = {l.name: l for l in keras_layers if l.weights}
    order = flax_weight_order(dense_skip)
    missing = [p for p, _ in order if p.replace("/", ".") not in by_name]
    assert not missing, f"keras model lacks named layers for: {missing}"
    extra = set(by_name) - {p.replace("/", ".") for p, _ in order}
    assert not extra, f"unmapped keras layers: {sorted(extra)}"
    for path, kind in order:
        layer = by_name[path.replace("/", ".")]
        node = params[root]
        parts = path.split("/")
        for p in parts[:-1]:
            node = node[p]
        dst = node[parts[-1]]
        ws = [np.asarray(w) for w in layer.get_weights()]
        if kind in ("conv", "convT"):
            assert dst["kernel"].shape == ws[0].shape, (
                path, dst["kernel"].shape, ws[0].shape)
            dst["kernel"] = ws[0]
            if len(ws) > 1:
                dst["bias"] = ws[1]
        else:  # norm: keras GroupNormalization stores gamma, beta
            dst["scale"] = ws[0]
            dst["bias"] = ws[1]
    return params


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        return tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree
