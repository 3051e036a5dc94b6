"""Train-time validation — the callbacks the reference left as 'TBA' stubs
(train_model.py:240-245) and whose tooling (deploy_FROC) was never released
(callbacks.py:20). Implemented for real here:

* ``PCaDetectionValidation``  — lesion task: case-wise detection probs ->
  patient AUROC, lesion FROC partial AUC, lesion AP, mean Dice.
* ``AnatomySegmentationValidation`` — zonal task: per-class (TZ/PZ) Dice.

Both consume a validation iterable of {'image','detection'} samples and a
jitted detect function; multi-sample Monte-Carlo aggregation (UNET_PROBA_ITER,
train_model.py:71) via infer.mc_predict.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..infer import mc_predict
from .metrics import dice_3d, froc_curve, lesion_average_precision, patient_auroc


def _reiterable(valid_samples: Iterable):
    """Keep re-iterable sequences (lists, evaluate._LazySamples) as-is so
    lazy views stay O(1)-memory; materialize one-shot generators, which
    would otherwise be exhausted after the first validation epoch."""
    return (valid_samples if hasattr(valid_samples, "__len__")
            else list(valid_samples))


def _case_probs(
    detect_fn: Callable,
    params,
    samples,
    rng: jax.Array,
    proba_iter: int = 1,
):
    probs, labels = [], []
    for s in samples:
        img = np.asarray(s["image"])[None]
        rng, k = jax.random.split(rng)
        if proba_iter > 1:
            p = mc_predict(detect_fn, params, img, k, num_samples=proba_iter)
        else:
            p = detect_fn(params, img, rng=k)
        probs.append(np.asarray(p)[0])
        labels.append(np.asarray(s["detection"]))
    return probs, labels


class PCaDetectionValidation:
    """Lesion-level validation (csPCa detection)."""

    def __init__(self, detect_fn: Callable, valid_samples: Iterable,
                 proba_iter: int = 1, threshold: float = 0.10, seed: int = 0):
        self.detect_fn = detect_fn
        self.samples = _reiterable(valid_samples)
        self.proba_iter = proba_iter
        self.threshold = threshold
        self.seed = seed

    def __call__(self, params) -> Dict[str, float]:
        probs, labels = _case_probs(
            self.detect_fn, params, self.samples,
            jax.random.PRNGKey(self.seed), self.proba_iter)
        fg_probs = [p[..., 1] for p in probs]
        fg_labels = [l[..., 1] for l in labels]
        case_targets = [int(l.max() > 0.5) for l in fg_labels]
        froc = froc_curve(fg_probs, fg_labels, threshold=self.threshold)
        # partial FROC AUC: mean sensitivity at 0.5,1,2,4 FP/case
        sens_at = []
        for fp in (0.5, 1.0, 2.0, 4.0):
            idx = np.searchsorted(froc["fp_per_case"], fp, side="right") - 1
            sens_at.append(float(froc["sensitivity"][idx]) if idx >= 0 else 0.0)
        dices = [
            dice_3d((p >= 0.5).astype(np.float32), (l > 0.5).astype(np.float32))
            for p, l in zip(fg_probs, fg_labels)
        ]
        return {
            "auroc": patient_auroc(fg_probs, case_targets),
            "froc_pauc": float(np.mean(sens_at)),
            "lesion_ap": lesion_average_precision(
                fg_probs, fg_labels, threshold=self.threshold),
            "dice": float(np.mean(dices)),
        }


class AnatomySegmentationValidation:
    """Zonal segmentation validation (WG/TZ/PZ Dice)."""

    def __init__(self, detect_fn: Callable, valid_samples: Iterable,
                 class_names=("WG", "TZ", "PZ"), proba_iter: int = 1,
                 seed: int = 0):
        self.detect_fn = detect_fn
        self.samples = _reiterable(valid_samples)
        self.class_names = class_names
        self.proba_iter = proba_iter
        self.seed = seed

    def __call__(self, params) -> Dict[str, float]:
        probs, labels = _case_probs(
            self.detect_fn, params, self.samples,
            jax.random.PRNGKey(self.seed), self.proba_iter)
        out: Dict[str, float] = {}
        for c, name in enumerate(self.class_names):
            if c == 0:
                continue  # background/whole-gland complement
            dices = [
                dice_3d((np.argmax(p, -1) == c).astype(np.float32),
                        (l[..., c] > 0.5).astype(np.float32))
                for p, l in zip(probs, labels)
            ]
            out[f"dice_{name}"] = float(np.mean(dices))
        out["dice_mean"] = float(np.mean([v for v in out.values()]))
        return out
