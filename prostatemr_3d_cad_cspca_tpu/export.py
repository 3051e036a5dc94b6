"""AOT export: self-contained serialized inference artifacts.

The reference deploys its trained models as a grand-challenge algorithm
container (reference README.md:6) — the TF graph plus H5 weights frozen
into an opaque runtime image. The TPU-native equivalent is ``jax.export``:
the full detect program (including Monte-Carlo sampling, flip-TTA,
fold-ensemble vmap and cascaded composition) is lowered once to StableHLO
with the trained weights baked in as constants, and serialized to ONE
portable file. Deployment then needs NO model code, NO Flax and NO
retracing — just ``ExportedModel.load(path).predict(x)`` on any machine
with jax and a plugin for a platform chosen at export time (default:
tpu AND cpu in the same artifact). The batch dimension is symbolic by
default, so one artifact serves any batch size.

Artifact format — a zip archive containing:
  ``program.bin``  jax.export-serialized StableHLO module (versioned ABI,
                   weights inlined as constants)
  ``meta.json``    I/O contract: input signature, rng convention,
                   mc_iter/TTA/ensemble provenance, output layout, and the
                   architecture config of the exporting model.

Output contract mirrors ``serve.InferenceSession``:
  deterministic          probs                       (B,D,H,W,nc)
  stochastic, mc_iter=1  probs (one posterior draw)  (B,D,H,W,nc)
  stochastic, mc_iter>1  (mean, std) over draws      2x(B,D,H,W,nc)
  cascaded               final-stage detection only, exams stacked on the
                         channel axis of the single input array
                         (reference networks.py:111-112 two-exam contract).
"""

from __future__ import annotations

import json
import zipfile
from typing import Optional, Sequence

__all__ = ["export_model", "ExportedModel"]

_FORMAT_VERSION = 1


def _detect_parts(model, tta: bool):
    """Shared setup for the exported heads: the (possibly TTA-wrapped)
    detect fn plus the cascaded/rng facts both heads branch on."""
    detect = model.get_detect_model()
    if tta:
        from .ensemble import tta_detect

        detect = tta_detect(detect)
    needs_rng = bool(
        model.probabilistic
        or model.config.get("dropout_mode") == "monte-carlo")
    return detect, bool(model.cascaded), int(model.input_channels), needs_rng


def _detect_head(model, mc_iter: int, tta: bool):
    """Close the detect program over the trained params.

    Returns ``(fn, needs_rng)`` where ``fn`` takes ONE stacked input array
    (cascaded exams concatenated on channels, same convention as the
    sliding-window program in serve.py) and, when ``needs_rng``, a raw
    uint32[2] PRNG key.
    """
    detect, casc, c, needs_rng = _detect_parts(model, tta)
    params = model.params

    def _split(x):
        return (x[..., :c], x[..., c:]) if casc else x

    if needs_rng and mc_iter > 1:
        from .infer import mc_predict

        def fn(x, rng):
            mean, std = mc_predict(detect, params, _split(x), rng,
                                   num_samples=mc_iter, reduce="mean_std")
            if casc:  # final-stage detection + uncertainty
                mean, std = mean[-1], std[-1]
            return mean, std
    elif needs_rng:
        def fn(x, rng):
            out = detect(params, _split(x), rng=rng)
            return out[-1] if casc else out
    else:
        def fn(x):
            out = detect(params, _split(x))
            return out[-1] if casc else out
    return fn, needs_rng


def _tile_head(model, mc_iter: int, tta: bool):
    """Tile-level forward for sliding-window export, mirroring
    serve.InferenceSession._sw_program's composition: MC mean/std are
    concatenated on channels (out_mult=2) so the Gaussian blend aggregates
    both; cascaded exams arrive stacked on the channel axis."""
    import jax
    import jax.numpy as jnp

    detect, casc, c, needs_rng = _detect_parts(model, tta)
    params = model.params

    def fwd(tiles, rng=None):
        inp = (tiles[..., :c], tiles[..., c:]) if casc else tiles
        out = detect(params, inp, rng=rng) if needs_rng \
            else detect(params, inp)
        return out[-1] if casc else out

    if needs_rng and mc_iter > 1:
        def tile_fn(tiles, key):
            s = jax.vmap(lambda k: fwd(tiles, k))(
                jax.random.split(key, mc_iter))
            return jnp.concatenate([s.mean(axis=0), s.std(axis=0)], -1)
        return tile_fn, True, 2
    if needs_rng:
        return fwd, True, 1
    return (lambda tiles: fwd(tiles)), False, 1


def export_model(
    model,
    path: str,
    *,
    mc_iter: int = 1,
    tta: bool = False,
    platforms: Sequence[str] = ("tpu", "cpu"),
    batch: Optional[int] = None,
    transfer_dtype: Optional[str] = None,
    sw_shapes: Optional[Sequence[Sequence[int]]] = None,
    sw_overlap: float = 0.5,
) -> str:
    """Serialize ``model``'s inference program (weights included) to ``path``.

    model: an ``M1`` or ``ensemble.M1Ensemble`` (any class: deterministic,
        MC-dropout, probabilistic, cascaded).
    mc_iter: >1 bakes mean/std Monte-Carlo aggregation into the program
        (stochastic models only).
    tta: fuse axial flip test-time augmentation (ensemble.tta_detect).
    platforms: lowering targets; the artifact runs on ANY of them.
    batch: fixed batch size, or None for a symbolic batch dimension
        (one artifact, any batch).
    transfer_dtype: e.g. "float16" — cast outputs inside the program
        (serve's device->host transfer-slimming; quantizes probabilities
        by <=~5e-4).
    sw_shapes: optional list of oversized case geometries (D, H, W); for
        each, a ONE-program Gaussian-blended sliding-window pipeline
        (infer.make_sliding_window_fn — tile gather, forward, blended
        scatter in a single StableHLO module) is exported alongside the
        window program, with a symbolic case axis. Deployment then serves
        whole-gland volumes of those geometries from the same artifact
        (``ExportedModel.predict_cases``).
    sw_overlap: tile overlap fraction for the sliding-window programs.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    head, needs_rng = _detect_head(model, mc_iter, tta)
    if transfer_dtype is not None:
        odt = jnp.dtype(transfer_dtype)
        base = head
        if needs_rng:
            def head(x, rng):  # noqa: F811 — cast wrapper
                return jax.tree.map(lambda a: a.astype(odt), base(x, rng))
        else:
            def head(x):  # noqa: F811
                return jax.tree.map(lambda a: a.astype(odt), base(x))

    spatial = tuple(int(d) for d in model.input_spatial_dims)
    cin = int(model.input_channels) * (2 if model.cascaded else 1)
    if batch is None:
        bdims = jexport.symbolic_shape("b")
    else:
        bdims = (int(batch),)
    x_spec = jax.ShapeDtypeStruct((*bdims, *spatial, cin), jnp.float32)
    args = (x_spec,)
    if needs_rng:
        args += (jax.ShapeDtypeStruct((2,), jnp.uint32),)

    exported = jexport.export(jax.jit(head), platforms=tuple(platforms))(*args)

    sw_blobs = []
    sw_meta = []
    nc = int(model.num_classes)
    odt = jnp.dtype(transfer_dtype) if transfer_dtype is not None else None
    if sw_shapes:
        from .infer import make_sliding_window_fn

        tile_fn, tile_rng, out_mult = _tile_head(model, mc_iter, tta)
    for i, shp in enumerate(sw_shapes or ()):
        shp = tuple(int(d) for d in shp)
        # cases=2 with no mesh selects the plain-vmap variant, which is
        # K-generic — exported below with a symbolic case axis
        run = make_sliding_window_fn(
            tile_fn, full_spatial=shp,
            window=tuple(int(d) for d in model.input_spatial_dims),
            in_channels=cin, out_channels=nc * out_mult,
            overlap=float(sw_overlap), cases=2, rng_per_chunk=tile_rng,
            out_dtype=odt)
        kdims = jexport.symbolic_shape(f"k{i}")
        v_spec = jax.ShapeDtypeStruct((*kdims, *shp, cin), jnp.float32)
        sw_args = (v_spec,)
        if tile_rng:
            sw_args += (jax.ShapeDtypeStruct((2,), jnp.uint32),)
        sw_blobs.append(
            jexport.export(run, platforms=tuple(platforms))(*sw_args)
            .serialize())
        sw_meta.append({
            "program": f"sw{i}.bin",
            "case_spatial": list(shp),
            "overlap": float(sw_overlap),
            "out_mult": out_mult,
            "needs_rng": tile_rng,
        })

    meta = {
        "format_version": _FORMAT_VERSION,
        "platforms": list(platforms),
        "input_spatial_dims": list(spatial),
        "input_channels": cin,
        "batch": batch,  # null -> symbolic
        "needs_rng": needs_rng,
        "mc_iter": int(mc_iter),
        "tta": bool(tta),
        "num_classes": int(model.num_classes),
        "cascaded": bool(model.cascaded),
        "probabilistic": bool(model.probabilistic),
        "num_members": int(getattr(model, "num_members", 1)),
        "output": ("mean_std" if (needs_rng and mc_iter > 1) else "probs"),
        "transfer_dtype": transfer_dtype,
        "sliding_window": sw_meta,
        "config": {k: v for k, v in model.config.items()
                   if k not in ("init_params",)},
    }
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("program.bin", exported.serialize())
        for entry, blob in zip(sw_meta, sw_blobs):
            z.writestr(entry["program"], blob)
        z.writestr("meta.json", json.dumps(meta, indent=1, default=str))
    import os

    os.replace(tmp, path)  # atomic, same contract as utils.serialization
    return path


class ExportedModel:
    """Runtime wrapper over a serialized artifact — no model code needed.

    ``predict(x, rng=None)`` matches ``serve.InferenceSession.__call__``
    semantics: fp32 numpy ``probs`` or ``(mean, std)``; stochastic programs
    self-advance an internal PRNG key when ``rng`` is omitted.
    """

    def __init__(self, exported, meta: dict, seed: int = 0,
                 sw_programs: Optional[dict] = None):
        import jax

        self._exp = exported
        self._sw = dict(sw_programs or {})  # case_spatial tuple -> (exp, entry)
        self.meta = dict(meta)
        self.needs_rng = bool(meta["needs_rng"])
        self.num_classes = int(meta["num_classes"])
        self.mc_iter = int(meta["mc_iter"])
        # duck-typed corner of the M1 surface (serve.run case loading)
        self.cascaded = bool(meta["cascaded"])
        self.probabilistic = bool(meta["probabilistic"])
        self.input_spatial_dims = tuple(meta["input_spatial_dims"])
        self.input_channels = int(meta["config"]["input_channels"])
        self.config = dict(meta["config"])
        self._rng = jax.random.PRNGKey(seed)

    @classmethod
    def load(cls, path: str, seed: int = 0) -> "ExportedModel":
        from jax import export as jexport

        with zipfile.ZipFile(path, "r") as z:
            meta = json.loads(z.read("meta.json"))
            exported = jexport.deserialize(bytearray(z.read("program.bin")))
            sw = {}
            for entry in meta.get("sliding_window", []):
                sw[tuple(entry["case_spatial"])] = (
                    jexport.deserialize(bytearray(z.read(entry["program"]))),
                    entry)
        return cls(exported, meta, seed=seed, sw_programs=sw)

    def predict(self, x, rng=None):
        import jax
        import numpy as np

        x = np.asarray(x, np.float32)
        fixed = self.meta.get("batch")
        if fixed is not None and x.shape[0] != fixed:
            raise ValueError(
                f"artifact was exported with fixed batch {fixed}; "
                f"got batch {x.shape[0]} (export with batch=None for a "
                "symbolic batch dimension)")
        if self.needs_rng:
            if rng is None:
                self._rng, rng = jax.random.split(self._rng)
            out = self._exp.call(x, np.asarray(rng, np.uint32))
        else:
            out = self._exp.call(x)
        if isinstance(out, tuple):
            return tuple(np.asarray(o, np.float32) for o in out)
        return np.asarray(out, np.float32)

    __call__ = predict

    @property
    def sw_geometries(self):
        """Case geometries with an exported sliding-window program."""
        return sorted(self._sw)

    @property
    def sw_entries(self):
        """Public view of the sliding-window metadata:
        ``{case_spatial: {"overlap": ..., "out_mult": ..., ...}}``."""
        return {shape: dict(entry) for shape, (_, entry) in self._sw.items()}

    def predict_cases(self, vols, rng=None):
        """Whole-case sliding-window inference from the artifact's exported
        SW programs. ``vols``: list of (D, H, W, C) arrays sharing ONE
        geometry that was passed as ``sw_shapes`` at export time. Returns
        ``[(probs, std | None), ...]`` like serve sessions.
        """
        import jax
        import numpy as np

        block = np.stack([np.asarray(v, np.float32) for v in vols])
        shape = tuple(block.shape[1:-1])
        if shape not in self._sw:
            raise ValueError(
                f"no sliding-window program for case geometry {shape}; "
                f"artifact was exported with sw_shapes={self.sw_geometries} "
                "(re-export with this geometry, or serve from a live "
                "checkpoint)")
        exp_sw, entry = self._sw[shape]
        if entry["needs_rng"]:
            if rng is None:
                self._rng, rng = jax.random.split(self._rng)
            out = exp_sw.call(block, np.asarray(rng, np.uint32))
        else:
            out = exp_sw.call(block)
        out = np.asarray(out, np.float32)
        nc = self.num_classes
        if entry["out_mult"] == 2:
            return [(out[i][..., :nc], out[i][..., nc:])
                    for i in range(len(vols))]
        return [(out[i], None) for i in range(len(vols))]


def build_parser():
    import argparse

    p = argparse.ArgumentParser(
        "prostatemr_3d_cad_cspca_tpu.export",
        description="Freeze a trained checkpoint (or a comma-separated fold "
                    "ensemble) into one self-contained serialized inference "
                    "artifact (StableHLO + weights).")
    p.add_argument("--MODEL", type=str, required=True,
                   help="checkpoint path; comma-separate K fold checkpoints "
                        "to bake the whole vmapped ensemble into the artifact")
    p.add_argument("--OUT", type=str, required=True,
                   help="output artifact path (.zip)")
    p.add_argument("--MC_ITER", type=int, default=1)
    p.add_argument("--TTA", type=int, default=0)
    p.add_argument("--PLATFORMS", type=str, nargs="+",
                   default=["tpu", "cpu"])
    p.add_argument("--BATCH", type=int, default=0,
                   help="fixed batch size; 0 = symbolic (any batch)")
    p.add_argument("--TRANSFER_DTYPE", type=str, default="float32",
                   choices=["float32", "float16", "bfloat16"])
    p.add_argument("--SW_SHAPE", type=int, nargs=3, action="append",
                   default=None, metavar=("D", "H", "W"),
                   help="oversized case geometry to bake a one-program "
                        "sliding-window pipeline for (repeatable); the "
                        "artifact then serves whole-gland volumes of these "
                        "shapes too")
    p.add_argument("--SW_OVERLAP", type=float, default=0.5)
    p.add_argument("--VALIDATE", type=int, default=1,
                   help="after exporting, reload the artifact and check a "
                        "random-input forward against the live model "
                        "(deployment safety; 0 skips)")
    return p


def main(argv=None) -> str:
    import os

    args = build_parser().parse_args(argv)
    from .load import load_model_spec

    model = load_model_spec(args.MODEL)
    tdt = args.TRANSFER_DTYPE
    out = export_model(
        model, args.OUT, mc_iter=args.MC_ITER, tta=bool(args.TTA),
        platforms=tuple(args.PLATFORMS),
        batch=(args.BATCH or None),
        transfer_dtype=None if tdt == "float32" else tdt,
        sw_shapes=args.SW_SHAPE, sw_overlap=args.SW_OVERLAP)
    size = os.path.getsize(out)
    print(f"Exported {args.MODEL} -> {out} "
          f"({size / 1e6:.1f} MB, platforms={args.PLATFORMS}, "
          f"batch={'symbolic' if not args.BATCH else args.BATCH}, "
          f"mc_iter={args.MC_ITER}, tta={bool(args.TTA)}, "
          f"sw_shapes={args.SW_SHAPE or []})")
    if int(getattr(args, "VALIDATE", 1)):
        try:
            err = validate_artifact(model, out, mc_iter=args.MC_ITER,
                                    tta=bool(args.TTA),
                                    transfer_dtype=None if tdt == "float32"
                                    else tdt)
        except BaseException:
            # never leave a failed artifact at the deployable path — a
            # pipeline that globs for the file instead of checking the
            # exit code must not ship it
            try:
                os.remove(out)
            except OSError:
                pass
            raise
        print(f"Validated: artifact == live model on a random batch "
              f"(max |diff| {err:.2e}, incl. "
              f"{len(args.SW_SHAPE or [])} sliding-window program(s))")
    return out


def validate_artifact(model, path: str, *, mc_iter: int = 1,
                      tta: bool = False,
                      transfer_dtype: Optional[str] = None,
                      batch: int = 2, seed: int = 0) -> float:
    """Reload ``path`` and compare one random-input forward against the
    live ``model`` under the SAME key (deployment safety gate). Returns the
    max abs deviation; raises if it exceeds the dtype-appropriate bound.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    loaded = ExportedModel.load(path)
    cin = int(loaded.meta["input_channels"])
    spatial = tuple(loaded.meta["input_spatial_dims"])
    fixed = loaded.meta.get("batch")
    b = int(fixed or batch)
    x = np.random.default_rng(seed).normal(
        size=(b, *spatial, cin)).astype(np.float32)

    head, needs_rng = _detect_head(model, mc_iter, tta)
    key = jax.random.PRNGKey(seed)
    ref = head(x, key) if needs_rng else head(x)
    got = loaded.predict(x, rng=key) if needs_rng else loaded.predict(x)
    ref_leaves = ref if isinstance(ref, tuple) else (ref,)
    got_leaves = got if isinstance(got, tuple) else (got,)
    err = max(float(np.max(np.abs(np.asarray(r, np.float32) - g)))
              for r, g in zip(ref_leaves, got_leaves))
    tol = 5e-3 if transfer_dtype else 1e-4

    # every sliding-window program ships validated too: a freshly-built
    # live pipeline (same factory, same key) must reproduce the
    # deserialized one
    if loaded.sw_entries:
        from .infer import make_sliding_window_fn

        tile_fn, tile_rng, out_mult = _tile_head(model, mc_iter, tta)
    for shape, entry in loaded.sw_entries.items():
        live = make_sliding_window_fn(
            tile_fn, full_spatial=shape,
            window=tuple(int(d) for d in model.input_spatial_dims),
            in_channels=cin,
            out_channels=int(model.num_classes) * out_mult,
            overlap=float(entry["overlap"]), cases=2,
            rng_per_chunk=tile_rng,
            out_dtype=jnp.dtype(transfer_dtype) if transfer_dtype else None)
        vols = np.random.default_rng(seed + 1).normal(
            size=(2, *shape, cin)).astype(np.float32)
        if tile_rng:
            ref_sw = np.asarray(live(vols, key), np.float32)
            got_sw = loaded.predict_cases(list(vols), rng=key)
        else:
            ref_sw = np.asarray(live(vols), np.float32)
            got_sw = loaded.predict_cases(list(vols))
        for i, (gp, gu) in enumerate(got_sw):
            stacked = (np.concatenate([gp, gu], -1)
                       if gu is not None else gp)
            err = max(err, float(np.max(np.abs(ref_sw[i] - stacked))))

    if err > tol:
        raise AssertionError(
            f"exported artifact deviates from the live model: max |diff| "
            f"{err:.3e} > {tol} — do not deploy {path}")
    return err


if __name__ == "__main__":
    main()
