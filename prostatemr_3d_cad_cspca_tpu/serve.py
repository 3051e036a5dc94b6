"""Batch inference / deployment driver ("serving").

The reference ships no serving code — deployment happened through a
grand-challenge.org algorithm container around the trained M1
(reference README.md:6). This module is that container's engine, TPU-native:

  * one jitted detect program reused across cases (compile once);
  * cases batched by shape to keep the MXU busy (big batches amortize the
    per-program cost — see docs/ROUND2_NOTES.md);
  * whole-gland volumes larger than the training window go through
    Gaussian-blended sliding-window inference (infer.sliding_window_predict);
  * probabilistic / monte-carlo models emit mean + per-voxel std over
    --MC_ITER posterior samples (reference --UNET_PROBA_ITER,
    train_model.py:71);
  * outputs: <p-id>_detection.npy (+ _uncertainty.npy) and a summary JSON
    with ranked lesion candidates (train.metrics.extract_lesion_candidates).

CLI:
  python -m prostatemr_3d_cad_cspca_tpu.serve \
      --MODEL weights/F1/model_weights_250.npz \
      --MANIFEST feed/test.csv --OUTPUT_DIR out/ [--BATCH_SIZE 8]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="M1 batch inference driver")
    p.add_argument("--MODEL", type=str, required=True,
                   help="checkpoint path (M1.save / CLI WeightsSaver output); "
                        "comma-separate K fold checkpoints to serve their "
                        "ensemble as ONE compiled program (ensemble.M1Ensemble); "
                        "or an AOT artifact .zip (export.py) for "
                        "model-code-free window-sized serving")
    p.add_argument("--MANIFEST", type=str, required=True,
                   help="csv/tsv/xlsx manifest with p-id,image_path columns")
    p.add_argument("--OUTPUT_DIR", type=str, required=True)
    p.add_argument("--TRAIN_OBJ", type=str, default="lesion")
    p.add_argument("--BATCH_SIZE", type=int, default=8)
    p.add_argument("--MC_ITER", type=int, default=1,
                   help="posterior samples for probabilistic/MC models")
    p.add_argument("--SW_OVERLAP", type=float, default=0.5,
                   help="sliding-window overlap for oversized volumes")
    p.add_argument("--WHITEN", type=int, default=0,
                   help="z-score inputs (for volumes not pre-whitened)")
    p.add_argument("--SEED", type=int, default=0)
    p.add_argument("--SAVE_UNCERTAINTY", type=int, default=1)
    p.add_argument("--DATA_PARALLEL", type=int, default=0,
                   help="shard the batched detect program over the first N "
                        "devices (0/1 = single device)")
    p.add_argument("--TRANSFER_DTYPE", type=str, default="float32",
                   choices=["float32", "float16"],
                   help="device-side output cast before the host pull; "
                        "float16 halves transfer bytes (quantizes "
                        "probabilities by <=~5e-4)")
    p.add_argument("--TTA", type=int, default=0,
                   help="test-time augmentation: average predictions over "
                        "the axial left-right flip (the reference's "
                        "label-symmetric train-time flip, "
                        "augmentations.py:156-163), fused into the same "
                        "compiled program")
    p.add_argument("--TRANSFER_CHANNELS", type=str, default="all",
                   choices=["all", "foreground"],
                   help="'foreground' drops the softmax background channel "
                        "on device and reconstructs it host-side as "
                        "1 - sum(foreground) — exact, and another ~2x off "
                        "the device->host transfer bytes (combine with "
                        "--TRANSFER_DTYPE float16 for ~4x vs fp32 full)")
    p.add_argument("--SCAN_CHUNK", type=int, default=0,
                   help="chunk size for scan-chunked batched inference: "
                        "batches larger than this run as ONE program that "
                        "lax.scans over chunks — peak activation HBM stays "
                        "at chunk size while the fixed per-program device "
                        "cost amortizes over the whole batch (0 = off)")
    return p


class InferenceSession:
    """Compile-once detect wrapper around a loaded M1 model.

    mesh: optional ``jax.sharding.Mesh`` with a ``data`` axis — the batched
    window-sized detect program then shards its batch dimension across the
    mesh (params replicated, outputs sharded), scaling serving throughput
    across a slice with XLA-inserted collectives only. ``__call__`` pads the
    batch up to a multiple of the data-axis size with a duplicated last
    case and strips the padding from the outputs. The sliding-window paths
    stay single-device (their case axis is typically smaller than a slice).
    """

    def __init__(self, model, mc_iter: int = 1, seed: int = 0, mesh=None,
                 transfer_dtype=None, tta: bool = False,
                 transfer_channels: str = "all",
                 scan_chunk: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        self.model = model  # an M1 or a duck-typed ensemble.M1Ensemble
        self.tta = bool(tta)
        self.mc_iter = int(mc_iter)
        self.mesh = mesh
        self._n_data = int(mesh.shape["data"]) if mesh is not None else 1
        # transfer_dtype ("float16"): cast outputs ON DEVICE before the
        # host pull. The measured device->host link runs at ~22 MB/s (60x
        # below host->device), so halving transfer bytes ~halves serving
        # latency; fp16 quantizes softmax probabilities by <=~5e-4.
        # Default None keeps outputs bit-exact fp32.
        self._out_dtype = (jnp.dtype(transfer_dtype)
                           if transfer_dtype is not None else None)
        # transfer_channels="foreground": drop the softmax BACKGROUND
        # channel on device and reconstruct it host-side as
        # 1 - sum(foreground). Exact for probabilities (the Gaussian blend
        # is linear and normalizes all channels by the same per-voxel
        # weight), and exact for MC std when num_classes == 2
        # (std(1 - p) == std(p)); with more classes the background std is
        # not derivable, so MC sessions fall back to full channels there.
        self._fg_only = (str(transfer_channels) == "foreground")
        if self._fg_only and model.num_classes > 2 and (
                mc_iter > 1 and (model.probabilistic or
                                 model.config.get("dropout_mode")
                                 == "monte-carlo")):
            self._fg_only = False  # background std not reconstructible
        self._rng = jax.random.PRNGKey(seed)
        self._needs_rng = bool(
            model.probabilistic
            or model.config.get("dropout_mode") == "monte-carlo")
        detect = model.get_detect_model()
        if self.tta:  # flip-TTA fused into every program built below
            from .ensemble import tta_detect

            detect = tta_detect(detect)
        self._detect = detect

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            dsh = NamedSharding(mesh, P("data"))
            jit_rng = dict(in_shardings=(rep, dsh, rep), out_shardings=dsh)
            jit_det = dict(in_shardings=(rep, dsh), out_shardings=dsh)
        else:
            jit_rng = jit_det = {}

        odt = self._out_dtype  # bound once: the jitted closure must not
        fgo = self._fg_only    # read mutable session state

        def _cast(out):
            if fgo:  # device-side background-channel drop before the pull
                out = jax.tree.map(lambda a: a[..., 1:], out)
            if odt is None:
                return out
            return jax.tree.map(lambda a: a.astype(odt), out)

        if self._needs_rng and self.mc_iter > 1:
            from .infer import mc_predict

            def body(params, x, rng):
                return _cast(mc_predict(detect, params, x, rng,
                                        num_samples=self.mc_iter,
                                        reduce="mean_std"))
        elif self._needs_rng:
            def body(params, x, rng):
                return _cast(detect(params, x, rng=rng))
        else:
            def body(params, x):
                return _cast(detect(params, x))
        self._body = body
        self._fn = jax.jit(body, **(jit_rng if self._needs_rng else jit_det))

        # scan_chunk: run big batches as ONE program scanning over chunks.
        # Peak activation HBM stays at chunk size while the fixed
        # per-program device cost amortizes over the whole batch — the
        # measured cfg1 knee-breaker (docs/ROUND4_NOTES.md: b128 single-step
        # 635 vol/s -> chunked 1000+ vol/s). One compiled program per
        # distinct chunk count (cached).
        self._scan_chunk = int(scan_chunk) if scan_chunk else None
        if self._scan_chunk and mesh is not None \
                and self._scan_chunk % self._n_data != 0:
            raise ValueError(
                f"scan_chunk={scan_chunk} must be a multiple of the mesh "
                f"data axis ({self._n_data}) so every chunk shards evenly")
        self._chunk_programs: dict = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._chunk_jit = dict(
                in_shardings=(NamedSharding(mesh, P()),
                              NamedSharding(mesh, P(None, "data")))
                + ((NamedSharding(mesh, P()),) if self._needs_rng else ()),
                out_shardings=None)
        else:
            self._chunk_jit = {}

    def _chunked_program(self, n_chunks: int):
        """jit( (params, (K, chunk, ...) x [, rng]) -> outputs (K*chunk, ...) );
        per-chunk rng derived by fold_in(rng, chunk_index)."""
        import jax
        import jax.numpy as jnp

        if n_chunks in self._chunk_programs:
            return self._chunk_programs[n_chunks]
        body = self._body
        needs_rng = self._needs_rng

        def run(params, xr, *rng):
            def scan_body(c, inp):
                i, xb = inp
                out = (body(params, xb, jax.random.fold_in(rng[0], i))
                       if needs_rng else body(params, xb))
                return c, out
            _, ys = jax.lax.scan(
                scan_body, None, (jnp.arange(n_chunks), xr))
            return jax.tree.map(
                lambda t: t.reshape(t.shape[0] * t.shape[1], *t.shape[2:]),
                ys)

        fn = jax.jit(run, **self._chunk_jit)
        self._chunk_programs[n_chunks] = fn
        return fn

    def __call__(self, batch):
        """Batch -> (probs, uncertainty | None), fp32 numpy.

        batch: (B, D, H, W, C) array; for cascaded models either an
        ``(image_1, image_2)`` tuple of such arrays (reference
        networks.py:111-112 — two same-geometry exams) or a single array,
        which is fed to BOTH stages (prior == follow-up).
        """
        import jax

        if self.model.cascaded and not isinstance(batch, tuple):
            batch = (batch, batch)
        b = (batch[0] if isinstance(batch, tuple) else batch).shape[0]
        chunked = self._scan_chunk and b > self._scan_chunk
        pad = ((-b) % self._scan_chunk if chunked
               else (-b) % self._n_data)
        if pad:  # chunk/mesh path: batch must divide the chunk/data axis
            def _pad(a):
                return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], 0)
            batch = (tuple(_pad(a) for a in batch)
                     if isinstance(batch, tuple) else _pad(batch))
        if chunked:
            ck = self._scan_chunk
            k = (b + pad) // ck

            def _split(a):
                return np.asarray(a).reshape(k, ck, *a.shape[1:])

            batch = (tuple(_split(a) for a in batch)
                     if isinstance(batch, tuple) else _split(batch))
            fn = self._chunked_program(k)
            if self._needs_rng:
                self._rng, sub = jax.random.split(self._rng)
                out = fn(self.model.params, batch, sub)
            else:
                out = fn(self.model.params, batch)
        elif self._needs_rng:
            self._rng, sub = jax.random.split(self._rng)
            out = self._fn(self.model.params, batch, sub)
        else:
            out = self._fn(self.model.params, batch)
        if self.mc_iter > 1 and self._needs_rng:
            mean, std = out
            if self.model.cascaded:  # final-stage detection + uncertainty
                mean, std = mean[-1], std[-1]
            return (self._unpack_mean(np.asarray(mean, np.float32))[:b],
                    self._unpack_std(np.asarray(std, np.float32))[:b])
        if isinstance(out, tuple):  # cascaded: final-stage detection
            out = out[-1]
        return self._unpack_mean(np.asarray(out, np.float32))[:b], None

    # host-side inverses of the device-side foreground-channel drop
    def _unpack_mean(self, fg: np.ndarray) -> np.ndarray:
        if not self._fg_only:
            return fg
        bg = 1.0 - fg.sum(axis=-1, keepdims=True)
        return np.concatenate([bg, fg], axis=-1)

    def _unpack_std(self, fg: np.ndarray) -> np.ndarray:
        if not self._fg_only:
            return fg
        # num_classes == 2 guaranteed by the __init__ fallback:
        # std(1 - p) == std(p)
        return np.concatenate([fg, fg], axis=-1)

    def predict_case(self, volume, sw_overlap: float = 0.5):
        """One whole case; sliding-window when oversized.

        volume: (D, H, W, C) array, or an ``(image_1, image_2)`` tuple for
        cascaded models.
        """
        window = tuple(self.model.input_spatial_dims)
        vols = volume if isinstance(volume, tuple) else (volume,)
        if self.model.cascaded and len(vols) == 1:
            vols = (vols[0], vols[0])
        if tuple(vols[0].shape[:-1]) == window:
            batch = tuple(v[None] for v in vols) if self.model.cascaded \
                else vols[0][None]
            probs, unc = self(batch)
            return probs[0], (unc[0] if unc is not None else None)

        # ONE compiled program per volume shape for EVERY model class (tile
        # gather + forward + per-chunk RNG + Gaussian blend fused — see
        # infer.make_sliding_window_fn); compiled closures cached per shape.
        # MC models additionally fuse the mean/std over posterior draws.
        import jax
        import jax.numpy as jnp

        stacked = np.concatenate(vols, axis=-1) if self.model.cascaded \
            else vols[0]
        run, out_mult = self._sw_program(tuple(stacked.shape),
                                         float(sw_overlap), cases=1)
        if self._needs_rng:
            self._rng, sub = jax.random.split(self._rng)
            out = np.asarray(run(jnp.asarray(stacked), sub), np.float32)
        else:
            out = np.asarray(run(jnp.asarray(stacked)), np.float32)
        return self._split_sw(out, out_mult)

    def _split_sw(self, out: np.ndarray, out_mult: int):
        """Split a sliding-window output block into (probs, std | None),
        reconstructing the background channel if the program transferred
        foreground channels only."""
        ncp = self.model.num_classes - (1 if self._fg_only else 0)
        if out_mult == 2:
            return (self._unpack_mean(out[..., :ncp]),
                    self._unpack_std(out[..., ncp:]))
        return self._unpack_mean(out), None

    def _sw_program(self, stacked_shape, sw_overlap: float, cases: int):
        """Cached one-program sliding window for this model class.

        stacked_shape: full-volume shape with cascaded exams concatenated on
        the channel axis (both stages tile with identical coordinates —
        reference networks.py:111-112 two-input contract). Returns
        ``(run, out_mult)`` where out_mult=2 means the program emits
        ``concat([mean, std], -1)`` over ``mc_iter`` posterior draws and the
        Gaussian blend aggregates both (per-voxel std is tile-blended — an
        aggregation of per-tile MC stds, matching what repeated tiled MC
        inference measures).
        """
        import jax
        import jax.numpy as jnp

        from .infer import make_sliding_window_fn

        cache = self.__dict__.setdefault("_sw_cache", {})
        ckey = (tuple(stacked_shape), float(sw_overlap), int(cases))
        if ckey in cache:
            return cache[ckey]

        window = tuple(self.model.input_spatial_dims)
        nc = self.model.num_classes
        c = self.model.input_channels
        casc = bool(self.model.cascaded)
        needs_rng = self._needs_rng
        mc = self.mc_iter if (needs_rng and self.mc_iter > 1) else 1
        detect = self._detect  # same (TTA/ensemble-wrapped) head as __call__
        params = self.model.params

        fgo = self._fg_only

        def fwd(tiles, rng=None):
            inp = (tiles[..., :c], tiles[..., c:]) if casc else tiles
            out = detect(params, inp, rng=rng) if needs_rng \
                else detect(params, inp)
            out = out[-1] if casc else out  # cascaded: final-stage detection
            # foreground-only transfer: the blend is linear and channel-
            # uniform, so dropping background BEFORE blending commutes with
            # the host-side 1-sum reconstruction
            return out[..., 1:] if fgo else out

        ncp = nc - (1 if fgo else 0)
        if needs_rng and mc > 1:
            def tile_fn(tiles, key):
                s = jax.vmap(lambda k: fwd(tiles, k))(
                    jax.random.split(key, mc))
                return jnp.concatenate([s.mean(0), s.std(0)], axis=-1)
            out_mult = 2
        else:
            tile_fn, out_mult = fwd, 1  # fwd(tiles) / fwd(tiles, rng)

        # K-case programs shard their case axis over the session mesh when
        # K divides its data dimension (whole-gland serving scale-out)
        sw_mesh = (self.mesh if (cases > 1 and self.mesh is not None
                                 and cases % self._n_data == 0) else None)
        run = make_sliding_window_fn(
            tile_fn, full_spatial=stacked_shape[:-1], window=window,
            in_channels=stacked_shape[-1], out_channels=ncp * out_mult,
            overlap=sw_overlap, cases=cases, rng_per_chunk=needs_rng,
            mesh=sw_mesh, out_dtype=self._out_dtype)
        cache[ckey] = (run, out_mult)
        return cache[ckey]

    def predict_cases(self, volumes, sw_overlap: float = 0.5,
                      group_size: int = 8):
        """K same-shape oversized cases as one K-case program.

        Works for every model class (cascaded tuples are channel-stacked;
        MC/probabilistic share one key per group, with per-chunk folding
        inside the program). Groups are padded to ``group_size`` with a
        duplicate volume so every group reuses ONE compiled program (K cases
        per program amortize the fixed per-program device cost —
        docs/ROUND3_NOTES.md measurements).

        Returns ``[(probs, uncertainty | None), ...]`` aligned with
        ``volumes``.
        """
        import jax
        import jax.numpy as jnp

        stacked = [np.concatenate(v, axis=-1) if isinstance(v, tuple) else v
                   for v in volumes]
        # k < 2 must take the single-case path: the cases=1 program expects
        # an UNBATCHED volume (make_sliding_window_fn only adds the case
        # axis for cases > 1).
        if (len(stacked) == 1 or int(group_size) < 2
                or len({tuple(v.shape) for v in stacked}) != 1):
            return [self.predict_case(v, sw_overlap=sw_overlap)
                    for v in volumes]

        k = min(int(group_size), len(stacked))
        if self._n_data > 1:
            # round K up to a data-axis multiple so the case axis shards
            # evenly (groups pad with duplicates anyway)
            k = max(self._n_data,
                    ((k + self._n_data - 1) // self._n_data) * self._n_data)
        run_k, out_mult = self._sw_program(tuple(stacked[0].shape),
                                           float(sw_overlap), cases=k)
        out: List[tuple] = []
        for i in range(0, len(stacked), k):
            group = stacked[i:i + k]
            pad = k - len(group)
            block = jnp.stack(group + [group[0]] * pad)
            if self._needs_rng:
                self._rng, sub = jax.random.split(self._rng)
                probs = np.asarray(run_k(block, sub), np.float32)
            else:
                probs = np.asarray(run_k(block), np.float32)
            out.extend(self._split_sw(probs[j], out_mult)
                       for j in range(len(group)))
        return out


class ExportedSession:
    """Serve window-sized cases from an AOT artifact (export.py) — the
    whole inference program (MC sampling / TTA / ensemble / cascaded
    composition and any transfer slimming) was baked at export time, so
    this session is a thin batching shim: no Flax, no tracing.

    Oversized (sliding-window) volumes need a live checkpoint — the tile
    program is built around the model — and raise a clear error here.
    """

    def __init__(self, model):
        self.model = model  # an export.ExportedModel (seeded at load time)
        self._fixed_batch = model.meta.get("batch")
        self._mean_std = model.meta["output"] == "mean_std"

    def __call__(self, batch):
        if isinstance(batch, tuple):  # cascaded: stack exams on channels
            batch = np.concatenate(batch, axis=-1)
        b = batch.shape[0]
        fixed = self._fixed_batch
        if fixed is not None:
            if b > fixed:
                raise ValueError(
                    f"artifact has fixed batch {fixed}; got {b} "
                    "(serve with --BATCH_SIZE <= that, or export with "
                    "batch=None)")
            if b < fixed:
                batch = np.concatenate(
                    [batch, np.repeat(batch[-1:], fixed - b, axis=0)], 0)
        out = self.model.predict(batch)
        if self._mean_std:
            mean, std = out
            return mean[:b], std[:b]
        return out[:b], None

    def predict_cases(self, vols, sw_overlap: float = 0.5,
                      group_size: int = 8):
        """Whole-case inference through the artifact's exported
        sliding-window programs (export_model(sw_shapes=...)). The overlap
        was baked at export time; a differing --SW_OVERLAP is noted as
        inert. Cases are grouped by geometry and each group is padded to
        one size with a duplicate volume, so every call reuses ONE
        compiled specialization of the symbolic-case-axis program (the
        live session keeps the same invariant). Results align with
        ``vols`` order."""
        stacked = [np.concatenate(v, axis=-1) if isinstance(v, tuple)
                   else np.asarray(v) for v in vols]  # cascaded: 2 exams
        baked = self.model.sw_entries
        if not baked:
            shapes = sorted({tuple(v.shape) for v in stacked})
            raise ValueError(
                "this artifact has no sliding-window programs (exported "
                f"without sw_shapes) — oversized case shapes {shapes} vs "
                f"window {tuple(self.model.input_spatial_dims)} need a "
                "re-export with sw_shapes=... or a live checkpoint")
        overlaps = {shape: entry["overlap"] for shape, entry in baked.items()}
        if any(abs(ov - float(sw_overlap)) > 1e-9
               for ov in overlaps.values()):
            print(f"# note: SW_OVERLAP={sw_overlap} ignored — overlaps "
                  f"{overlaps} baked into the artifact at export time",
                  flush=True)
        by_shape: Dict[tuple, List[int]] = {}
        for idx, v in enumerate(stacked):
            by_shape.setdefault(tuple(v.shape), []).append(idx)
        results: List[Optional[tuple]] = [None] * len(stacked)
        for idxs in by_shape.values():
            k = min(max(1, int(group_size)), len(idxs))
            for i in range(0, len(idxs), k):
                chunk = idxs[i:i + k]
                pad = k - len(chunk)
                block = [stacked[j] for j in chunk] + [stacked[chunk[-1]]] * pad
                got = self.model.predict_cases(block)
                for j, r in zip(chunk, got):
                    results[j] = r
        return results


def _load_one(row: Dict[str, str], train_obj: str, channels: int,
              whiten: bool) -> np.ndarray:
    from .data.generators import load_sample

    sample = load_sample(row, train_obj=train_obj, mode="test",
                         probabilistic=False)
    vol = sample["image"][..., :channels].astype(np.float32)
    if whiten:
        from .data.preprocess import whitening

        vol = np.stack([whitening(vol[..., c])
                        for c in range(vol.shape[-1])], axis=-1)
    return vol


def _load_case(row: Dict[str, str], train_obj: str, channels: int,
               whiten: bool, cascaded: bool = False):
    """Load one case. For cascaded models (two same-geometry exams,
    reference networks.py:111-112) a second ``image_path_2`` manifest column
    supplies image_2; absent that, the single exam feeds both stages."""
    vol = _load_one(row, train_obj, channels, whiten)
    if not cascaded:
        return vol
    if row.get("image_path_2"):
        row2 = dict(row, image_path=row["image_path_2"])
        return (vol, _load_one(row2, train_obj, channels, whiten))
    return (vol, vol)


def run(args) -> List[Dict]:
    from .data.manifest import read_manifest
    from .load import load_model_spec
    from .train.metrics import extract_lesion_candidates

    os.makedirs(args.OUTPUT_DIR, exist_ok=True)
    if str(args.MODEL).endswith(".zip") and \
            int(getattr(args, "DATA_PARALLEL", 0)) > 1:
        # fail before deserializing the artifact's StableHLO blobs
        raise ValueError(
            "--DATA_PARALLEL needs a live checkpoint; AOT artifacts "
            "run the program as exported (single device)")
    model = load_model_spec(args.MODEL, seed=args.SEED, allow_artifact=True)
    if hasattr(model, "sw_entries"):  # AOT artifact (export.ExportedModel)
        # The inference program — MC / TTA / ensemble / transfer slimming —
        # was baked at export time, so the corresponding flags are inert.
        inert = [f for f, dv in (("MC_ITER", 1), ("TTA", 0),
                                 ("TRANSFER_DTYPE", "float32"),
                                 ("TRANSFER_CHANNELS", "all"))
                 if getattr(args, f, dv) != dv]
        if inert:
            print(f"# note: {', '.join(inert)} ignored — baked into the "
                  "artifact at export time", flush=True)
        session = ExportedSession(model)
    else:
        mesh = None
        if int(getattr(args, "DATA_PARALLEL", 0)) > 1:
            from .parallel.mesh import make_mesh

            mesh = make_mesh(n_data=int(args.DATA_PARALLEL))
        tdt = getattr(args, "TRANSFER_DTYPE", "float32")
        session = InferenceSession(
            model, mc_iter=args.MC_ITER, seed=args.SEED, mesh=mesh,
            transfer_dtype=None if tdt == "float32" else tdt,
            tta=bool(getattr(args, "TTA", 0)),
            transfer_channels=getattr(args, "TRANSFER_CHANNELS", "all"),
            scan_chunk=int(getattr(args, "SCAN_CHUNK", 0)) or None)
    window = tuple(model.input_spatial_dims)
    rows = read_manifest(args.MANIFEST)

    # group window-sized cases into batches; oversized group by shape into
    # K-case one-program sliding windows (all model classes)
    results: List[Dict] = []
    pending: List[tuple] = []
    pending_sw: Dict[tuple, List[tuple]] = {}

    def flush():
        if not pending:
            return
        ids, vols = zip(*pending)
        if model.cascaded:
            batch = (np.stack([v[0] for v in vols]),
                     np.stack([v[1] for v in vols]))
        else:
            batch = np.stack(vols)
        probs, unc = session(batch)
        for i, pid in enumerate(ids):
            results.append(_emit(pid, probs[i],
                                 unc[i] if unc is not None else None))
        pending.clear()

    def _emit(pid: str, probs: np.ndarray, unc: Optional[np.ndarray]) -> Dict:
        det_path = os.path.join(args.OUTPUT_DIR, f"{pid}_detection.npy")
        np.save(det_path, probs.astype(np.float32))
        entry: Dict = {"p-id": pid, "detection_path": det_path}
        if unc is not None and args.SAVE_UNCERTAINTY:
            unc_path = os.path.join(args.OUTPUT_DIR, f"{pid}_uncertainty.npy")
            np.save(unc_path, unc.astype(np.float32))
            entry["uncertainty_path"] = unc_path
        fg = probs[..., -1]
        cands = sorted(extract_lesion_candidates(fg),
                       key=lambda c: -c["score"])
        entry["lesion_candidates"] = [
            {"score": round(c["score"], 6), "voxels": c["voxels"]}
            for c in cands[:10]]
        entry["case_score"] = round(float(fg.max()), 6)
        return entry

    # K-ladder on the chip: 206/254/293 ms total at K=4/8/12 whole-gland
    # cases (~10.9 ms marginal per case) — groups of 8 amortize the fixed
    # program cost well while bounding the HBM plan for volumes larger
    # than the measured 24x256x256.
    sw_group = max(1, min(args.BATCH_SIZE, 8))

    def flush_sw(items):
        ids, vols = zip(*items)
        outs = session.predict_cases(
            list(vols), sw_overlap=args.SW_OVERLAP, group_size=sw_group)
        for pid, (probs, unc) in zip(ids, outs):
            results.append(_emit(pid, probs, unc))
        items.clear()

    order: List[str] = []
    for row in rows:
        pid = row.get("p-id", os.path.basename(row["image_path"]))
        order.append(pid)
        vol = _load_case(row, args.TRAIN_OBJ, model.input_channels,
                         bool(args.WHITEN), cascaded=bool(model.cascaded))
        shape_src = vol[0] if isinstance(vol, tuple) else vol
        if tuple(shape_src.shape[:-1]) == window:
            pending.append((pid, vol))
            if len(pending) >= args.BATCH_SIZE:
                flush()
        else:
            items = pending_sw.setdefault(tuple(shape_src.shape), [])
            items.append((pid, vol))
            # process full groups eagerly: host memory stays O(group),
            # not O(total oversized cases)
            if len(items) >= sw_group:
                flush_sw(items)
    flush()
    for items in pending_sw.values():
        if items:
            flush_sw(items)
    pending_sw.clear()

    # results accumulate batched-window cases and sliding-window groups in
    # completion order; re-emit in manifest order so positional consumers
    # of predictions.json stay correct
    rank = {pid: i for i, pid in enumerate(order)}
    results.sort(key=lambda r: rank.get(r["p-id"], len(rank)))

    summary_path = os.path.join(args.OUTPUT_DIR, "predictions.json")
    with open(summary_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"{len(results)} cases -> {summary_path}", flush=True)
    return results


def main(argv=None):
    args, _ = build_parser().parse_known_args(argv)
    run(args)


if __name__ == "__main__":
    main()
