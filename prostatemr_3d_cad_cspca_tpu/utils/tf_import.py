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

import re
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


def flax_prob_core_order(
    prob_latent_dims: Sequence[int], deep_supervision: bool = False,
    dense_skip: bool = False,
) -> List[Tuple[str, str]]:
    """(path, kind) list for a PROBABILISTIC M1Core: the deterministic trunk
    plus the deep-supervision heads (used only when enabled) and the latent
    ladder (mu_logsig_i / dec_hi_i / sersp_i per level, reference
    networks.py:534-565; flax list-attribute naming)."""
    order = list(flax_weight_order(dense_skip))
    if deep_supervision:
        order += [(f"dsy{i}_logits", "conv") for i in (1, 2, 3)]
    for i, dim in enumerate(prob_latent_dims):
        if dim != 0:
            order += [(f"mu_logsig_{i}", "conv")]
        order += [(f"dec_hi_{i}", "convT")]
        order += [
            (f"sersp_{i}/conv1", "conv"), (f"sersp_{i}/norm1", "norm"),
            (f"sersp_{i}/conv2", "conv"), (f"sersp_{i}/norm2", "norm"),
            (f"sersp_{i}/conv3", "conv"), (f"sersp_{i}/norm3", "norm"),
            (f"sersp_{i}/conv4", "conv"), (f"sersp_{i}/norm4", "norm"),
            (f"sersp_{i}/se_conv6", "conv"), (f"sersp_{i}/se_conv7", "conv"),
        ]
    return order


def import_keras_m1_prob_weights(
    keras_layers, flax_params: Dict, prob_latent_dims: Sequence[int],
    deep_supervision: bool = False, dense_skip: bool = False,
) -> Dict:
    """Name-based import for the probabilistic M1Net: Keras layers named
    'prior.<path>' / 'posterior.<path>' / 'final_decoder.logits' (the twin
    in benchmarks/tf_prob_twin.py) -> params under 'prior'/'posterior'/
    'final_decoder'. Shape-checked per leaf; unmatched layers raise."""
    import copy

    params = copy.deepcopy({k: v for k, v in _to_mutable(flax_params).items()})
    by_name = {l.name: l for l in keras_layers if l.weights}
    for root, ds in (("prior", deep_supervision), ("posterior", False)):
        for path, kind in flax_prob_core_order(
                prob_latent_dims, deep_supervision=ds, dense_skip=dense_skip):
            lname = f"{root}." + path.replace("/", ".")
            layer = by_name.pop(lname, None)
            assert layer is not None, f"keras twin lacks layer {lname!r}"
            _assign(params, root, path, kind,
                    [np.asarray(w) for w in layer.get_weights()], src=lname)
    layer = by_name.pop("final_decoder.logits", None)
    assert layer is not None, "keras twin lacks final_decoder.logits"
    _assign(params, "final_decoder", "logits", "conv",
            [np.asarray(w) for w in layer.get_weights()],
            src="final_decoder.logits")
    assert not by_name, f"unmapped keras layers: {sorted(by_name)}"
    return params


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


# --------------------------------------------------------------------------
# Build-order import: load the reference's H5 checkpoints AS SHIPPED
# (Keras default layer names — modelio.py:98-117 never renames layers).
# --------------------------------------------------------------------------

def _kind_of_layer_name(name: str):
    """Classify a Keras layer by its (default) name.

    TF2.5 reference layer classes and their auto-names:
      Conv3D -> 'conv3d[_N]'; Conv3DTranspose -> 'conv3d_transpose[_N]';
      tfa InstanceNormalization / GroupNormalization ->
      '*normalization[_N]'. Weightless layers (activations, upsampling,
      pooling, inputs) return None.
    """
    n = name.lower()
    if "transpose" in n:
        return "convT"
    if "normalization" in n:
        return "norm"
    if "conv" in n:
        return "conv"
    return None


def _creation_index(name: str) -> int:
    """Keras auto-names carry a per-class creation counter: the first
    instance is bare ('conv3d'), later ones suffixed ('conv3d_7'). Sorting
    by this counter recovers CREATION order even when the layer list (or the
    H5 'layer_names' attr) is stored topologically."""
    m = re.search(r"_(\d+)$", name)
    return int(m.group(1)) if m else -1


def _assign(params: Dict, root: str, path: str, kind: str,
            ws: Sequence[np.ndarray], src: str):
    node = params[root]
    parts = path.split("/")
    for p in parts[:-1]:
        node = node[p]
    dst = node[parts[-1]]
    if kind in ("conv", "convT"):
        assert tuple(dst["kernel"].shape) == tuple(ws[0].shape), (
            f"{src} -> {path}: kernel shape {ws[0].shape} != "
            f"{tuple(dst['kernel'].shape)}")
        dst["kernel"] = np.asarray(ws[0])
        if len(ws) > 1:
            assert tuple(dst["bias"].shape) == tuple(ws[1].shape), (src, path)
            dst["bias"] = np.asarray(ws[1])
    else:  # norm: gamma, beta
        assert tuple(dst["scale"].shape) == tuple(ws[0].shape), (src, path)
        dst["scale"] = np.asarray(ws[0])
        dst["bias"] = np.asarray(ws[1])


def import_keras_m1_weights_by_order(
    named_weights: Sequence[Tuple[str, Sequence[np.ndarray]]],
    flax_params: Dict, root: str = "core", dense_skip: bool = False,
) -> Dict:
    """Import weights matched by per-class CREATION order — no renamed
    layers required, so the reference's published checkpoints load as
    shipped (VERDICT r2 item 4).

    ``named_weights``: [(keras_layer_name, [weight arrays])] for every
    weighted layer (any order). Each class bucket (Conv3D / Conv3DTranspose
    / normalization) is sorted by the Keras auto-name counter and zipped
    against ``flax_weight_order``'s same-kind subsequence — the reference
    builds its graph strictly in call order (networks.py:472-526), so the
    k-th created Conv3D IS the k-th conv in the flax order. Every
    assignment is shape-checked; a mismatch raises with both names.
    """
    import copy

    params = copy.deepcopy({k: v for k, v in _to_mutable(flax_params).items()})
    order = flax_weight_order(dense_skip)
    want: Dict[str, List[str]] = {"conv": [], "convT": [], "norm": []}
    for path, kind in order:
        want[kind].append(path)
    have: Dict[str, List[Tuple[int, str, Sequence[np.ndarray]]]] = {
        "conv": [], "convT": [], "norm": []}
    for name, ws in named_weights:
        kind = _kind_of_layer_name(name)
        if kind is None:
            raise ValueError(f"cannot classify weighted keras layer {name!r}")
        have[kind].append((_creation_index(name), name, list(ws)))
    for kind in have:
        have[kind].sort(key=lambda t: t[0])
        if len(have[kind]) != len(want[kind]):
            raise ValueError(
                f"{kind}: checkpoint has {len(have[kind])} layers, "
                f"architecture expects {len(want[kind])} "
                f"({[n for _, n, _ in have[kind]]} vs {want[kind]})")
    for kind in ("conv", "convT", "norm"):
        for path, (_, name, ws) in zip(want[kind], have[kind]):
            _assign(params, root, path, kind, ws, src=name)
    return params


def read_legacy_h5_weights(path: str) -> List[Tuple[str, List[np.ndarray]]]:
    """Read a TF2.x topological ``save_weights`` H5 (the format the
    reference's modelio.py:90-96 writes): root/['model_weights'] attr
    'layer_names', per-layer group attr 'weight_names', datasets under
    ``<layer>/<weight_name>``. Returns [(layer_name, [arrays])] for every
    layer that carries weights, in stored order."""
    import h5py

    def _s(v):
        return v.decode() if isinstance(v, bytes) else str(v)

    out: List[Tuple[str, List[np.ndarray]]] = []
    with h5py.File(path, "r") as f:
        g = f["model_weights"] if "model_weights" in f else f
        for ln in [_s(n) for n in g.attrs["layer_names"]]:
            lg = g[ln]
            wnames = [_s(n) for n in lg.attrs.get("weight_names", [])]
            if not wnames:
                continue
            out.append((ln, [np.asarray(lg[w]) for w in wnames]))
    return out


def import_reference_h5(
    h5_path: str, flax_params: Dict, root: str = "core",
    dense_skip: bool = False,
) -> Dict:
    """One-call import of a reference-saved H5 checkpoint (Keras default
    names, TF2.5 topological format) into the Flax param tree. No TF needed
    at import time — the H5 is read directly (h5py)."""
    return import_keras_m1_weights_by_order(
        read_legacy_h5_weights(h5_path), flax_params, root=root,
        dense_skip=dense_skip)
