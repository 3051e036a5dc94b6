"""Single-file model serialization: architecture config + param pytree.

Parity target: the reference's H5-with-embedded-config checkpoints
(modelio.py:98-117 — JSON ``model_config`` attribute + weights in one file).
Here: one ``.npz`` holding every param leaf under its '/'-joined keypath plus
a ``__config__`` JSON blob. Atomic write (tmp+rename) — the reference instead
looped retrying ``BlockingIOError`` on NFS (callbacks.py:59-74); atomic
rename removes the race rather than retrying through it.

Full training state (params + opt state + step) uses orbax in
train/checkpoint.py; this module is the lightweight ``M1.save``/``M1.load``
surface.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_model(path: str, config: Dict[str, Any], params) -> None:
    flat = _flatten(params)
    flat["__config__"] = np.frombuffer(
        json.dumps(config, default=str).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_model(path: str) -> Tuple[Dict[str, Any], Any]:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    config = json.loads(bytes(flat.pop("__config__").tobytes()).decode())
    # JSON round-trips tuples as lists; model ctors normalize via
    # _as_nested_tuple, so lists are fine here.
    return config, _unflatten(flat)
