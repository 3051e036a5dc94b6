"""Offline evaluation driver: checkpoint + manifest -> detection metrics.

The reference intended exactly this — its validation callbacks are 'TBA'
stubs (reference train_model.py:240-245) importing a never-released
internal tool (deploy_FROC, callbacks.py:20). Here the metrics are
implemented for real (train/metrics.py, train/validation.py) and this
driver closes the workflow loop: train (cli.py) -> evaluate (this) ->
serve (serve.py).

  python -m prostatemr_3d_cad_cspca_tpu.evaluate \\
    --MODEL weights/F1/model_weights_250.npz --MANIFEST valid-fold-1.csv \\
    --TRAIN_OBJ lesion --PROBA_ITER 5 --OUTPUT metrics.json

Lesion task -> patient AUROC, lesion FROC partial AUC (mean sensitivity
at 0.5/1/2/4 FP per case), lesion AP, mean Dice; zonal task -> per-class
TZ/PZ Dice. Comma-separated checkpoints evaluate the fold ensemble as one
vmapped program (ensemble.M1Ensemble), matching the deployed
configuration.
"""

from __future__ import annotations

import json
import os
from typing import Dict

__all__ = ["run", "main", "build_parser"]


def build_parser():
    import argparse

    p = argparse.ArgumentParser(
        "prostatemr_3d_cad_cspca_tpu.evaluate",
        description="Evaluate a trained checkpoint (or comma-separated fold "
                    "ensemble) on a labeled manifest.")
    p.add_argument("--MODEL", type=str, required=True,
                   help="checkpoint path; comma-separate K fold checkpoints "
                        "to evaluate their ensemble")
    p.add_argument("--MANIFEST", type=str, required=True,
                   help="labeled manifest (.csv/.tsv/.xlsx): p-id, "
                        "image_path, label_path, zones_path")
    p.add_argument("--TRAIN_OBJ", type=str, default="lesion",
                   choices=["lesion", "zonal"])
    p.add_argument("--PROBA_ITER", type=int, default=1,
                   help="Monte-Carlo samples per case (reference "
                        "--UNET_PROBA_ITER, train_model.py:71)")
    p.add_argument("--THRESHOLD", type=float, default=0.10,
                   help="lesion candidate extraction threshold")
    p.add_argument("--TTA", type=int, default=0,
                   help="fuse axial flip test-time augmentation")
    p.add_argument("--SEED", type=int, default=0)
    p.add_argument("--OUTPUT", type=str, default="",
                   help="write the metrics dict to this JSON path")
    return p


class _LazySamples:
    """Re-iterable, O(1)-memory view of a labeled manifest: each pass
    loads/preprocesses one case at a time (the validators consume samples
    strictly sequentially, so nothing needs to stay resident)."""

    def __init__(self, rows, train_obj: str, probabilistic: bool,
                 cascaded: bool = False):
        from .data.generators import load_sample

        self._load = load_sample
        self.rows = rows
        self.train_obj = train_obj
        self.probabilistic = probabilistic
        self.cascaded = cascaded

    def __len__(self):
        return len(self.rows)

    def __iter__(self):
        import numpy as np

        for row in self.rows:
            s = self._load(row, train_obj=self.train_obj,
                           probabilistic=self.probabilistic, mode="valid")
            if self.cascaded:
                # two-exam contract (reference networks.py:111-112), same
                # as serve._load_case: an image_path_2 column supplies the
                # second exam; absent that, exam 1 feeds both stages.
                # Exams are stacked on channels; the detect wrapper splits.
                if (row.get("image_path_2") or "").strip():
                    row2 = dict(row, image_path=row["image_path_2"])
                    img2 = self._load(
                        row2, train_obj=self.train_obj,
                        probabilistic=self.probabilistic,
                        mode="valid")["image"]
                else:
                    img2 = s["image"]
                s = dict(s, image=np.concatenate([s["image"], img2], -1))
            yield s


def run(args) -> Dict[str, float]:
    from .data.manifest import read_manifest
    from .load import load_model_spec
    from .train.validation import (AnatomySegmentationValidation,
                                   PCaDetectionValidation)

    model = load_model_spec(args.MODEL)

    detect = model.get_detect_model()
    if int(getattr(args, "TTA", 0)):
        from .ensemble import tta_detect

        detect = tta_detect(detect)
    if model.cascaded:
        # Cascaded two-exam contract (reference networks.py:111-112):
        # _LazySamples stacks the exams on channels (an image_path_2
        # manifest column supplies exam 2, serve._load_case parity); the
        # wrapper splits them and scores the FINAL-stage detection,
        # matching serve/export semantics.
        base_detect = detect
        c = int(model.input_channels)

        def detect(params, x, rng=None):  # noqa: F811
            return base_detect(params, (x[..., :c], x[..., c:]),
                               rng=rng)[-1]

    rows = read_manifest(args.MANIFEST)
    assert rows, f"empty manifest: {args.MANIFEST}"
    samples = _LazySamples(rows, args.TRAIN_OBJ,
                           probabilistic=bool(model.probabilistic),
                           cascaded=bool(model.cascaded))

    if args.TRAIN_OBJ == "lesion":
        validator = PCaDetectionValidation(
            detect, samples, proba_iter=int(args.PROBA_ITER),
            threshold=float(args.THRESHOLD), seed=int(args.SEED))
    else:
        if float(args.THRESHOLD) != 0.10:
            print("# note: --THRESHOLD is a lesion-candidate parameter; "
                  "inert for the zonal task", flush=True)
        validator = AnatomySegmentationValidation(
            detect, samples, proba_iter=int(args.PROBA_ITER),
            seed=int(args.SEED))
    import numpy as np

    # undefined metrics (e.g. patient AUROC with single-class targets)
    # emit null, not NaN — NaN is not valid strict JSON
    metrics = {k: (round(float(v), 6) if np.isfinite(v) else None)
               for k, v in validator(model.params).items()}
    metrics["cases"] = len(samples)

    print(json.dumps(metrics), flush=True)
    if args.OUTPUT:
        tmp = args.OUTPUT + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(args.OUTPUT)),
                    exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(metrics, f, indent=1)
        os.replace(tmp, args.OUTPUT)
    return metrics


def main(argv=None) -> Dict[str, float]:
    return run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
