"""Data generators: manifest -> preprocessed .npy -> model-ready samples.

Parity target: ``custom_data_generator`` (reference data_generators.py:30-88)
and ``contour_smoothening`` (:92-97). Per-task label handling:

  * zonal  — split zones into TZ/PZ binaries, Gaussian-blur contour
             smoothening per axial slice, 3-class one-hot (WG=1-TZ-PZ,TZ,PZ);
  * lesion — binarize GGG>=2, smoothen, 2-class one-hot;
  * probabilistic mode — append the (zeroed-at-valid/test) foreground label
    channels onto the image and yield a zeros 'KL' target
    (data_generators.py:77-84).

JAX-first differences: finite epoch iteration with an explicit deterministic
shuffle key (the reference used an infinite generator + tf.data.shuffle), and
a ``batch_iterator`` that yields stacked, ready-to-device batches. Augmentation
runs ON DEVICE inside the train step (see ``augment``), not in CPU workers.
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from .manifest import read_manifest

try:  # pragma: no cover - env dependent
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _gaussian_kernel_1d(ksize: int = 7, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel parity: sigma<=0 => 0.3*((k-1)*0.5-1)+0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return k / k.sum()


def contour_smoothening(
    label: np.ndarray, kernel_2d=(7, 7), iterations: int = 1
) -> np.ndarray:
    """Per-slice 2D Gaussian blur of a (D,H,W) uint8 mask
    (reference data_generators.py:92-97). Priority: cv2 (reference-exact) ->
    native C++ (native/edt.cpp, within +/-1 gray level of cv2's fixed-point
    rounding) -> separable NumPy filter. All use BORDER_REFLECT_101."""
    if not _HAS_CV2:
        try:
            from ..utils.native import contour_smooth as _native_smooth
        except Exception:  # pragma: no cover
            _native_smooth = None
        if _native_smooth is not None:
            out = label.astype(np.uint8)
            for _ in range(iterations):
                got = _native_smooth(out, kernel_2d[0])
                if got is None:
                    break
                out = got
            else:
                return out.astype(label.dtype)
    label = label.copy()
    for _ in range(iterations):
        for k in range(label.shape[0]):
            sl = label[k].astype(np.uint8)
            if _HAS_CV2:
                label[k] = cv2.GaussianBlur(sl, tuple(kernel_2d), cv2.BORDER_DEFAULT)
            else:
                kern = _gaussian_kernel_1d(kernel_2d[0])
                pad = len(kern) // 2
                x = np.pad(sl.astype(np.float64), pad, mode="reflect")
                x = np.apply_along_axis(
                    lambda m: np.convolve(m, kern, mode="valid"), 0, x)
                x = np.apply_along_axis(
                    lambda m: np.convolve(m, kern, mode="valid"), 1, x)
                label[k] = np.rint(x).astype(label.dtype)
    return label


def load_sample(
    row: Dict[str, str],
    train_obj: str = "zonal",
    probabilistic: bool = False,
    mode: str = "train",
) -> Dict[str, np.ndarray]:
    """One case -> model I/O dict (reference data_generators.py:43-88)."""
    if train_obj == "zonal":
        image = np.load(row["image_path"])[:, :, :, :1]
        if mode != "test":
            zones = np.load(row["zones_path"]).astype(np.uint8)
        else:
            zones = np.zeros_like(image[..., 0], dtype=np.uint8)
        tz, pz = zones.copy(), zones.copy()
        tz[zones != 1], pz[zones != 2] = 0, 0
        tz[zones == 1], pz[zones == 2] = 1, 1
        tz, pz = contour_smoothening(tz), contour_smoothening(pz)
        label = np.stack([np.ones_like(zones) - tz - pz, tz, pz], axis=-1)
    elif train_obj == "lesion":
        image = np.load(row["image_path"])
        if mode != "test":
            lesions = np.load(row["label_path"])
        else:
            lesions = np.zeros_like(image[..., 0])
        lesions = lesions.copy()
        lesions[lesions <= 1] = 0
        lesions[lesions >= 2] = 1  # csPCa: GGG >= 2
        lesions = contour_smoothening(lesions.astype(np.uint8))
        label = np.stack([np.ones_like(lesions) - lesions, lesions], axis=-1)
    else:
        raise ValueError(f"Unknown train_obj {train_obj!r}")

    image = image.astype(np.float32)
    label = label.astype(np.float32)

    if mode in ("test", "valid"):
        postq_lbl = np.zeros_like(label)[:, :, :, 1:]
    else:
        postq_lbl = label[:, :, :, 1:]

    if probabilistic:
        return {
            "image": np.concatenate([image, postq_lbl], axis=-1),
            "detection": label,
            "KL": np.zeros(label.shape, np.float32),
        }
    return {"image": image, "detection": label}


def custom_data_generator(
    data_manifest: str,
    train_obj: str = "zonal",
    probabilistic: bool = False,
    mode: str = "train",
    shuffle_seed: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite per-sample generator (reference data_generators.py:30-88),
    with optional deterministic per-epoch shuffling."""
    rows = read_manifest(data_manifest)
    rng = np.random.default_rng(shuffle_seed) if shuffle_seed is not None else None
    for epoch in itertools.count():
        order = np.arange(len(rows))
        if rng is not None:
            rng.shuffle(order)
        for i in order:
            yield load_sample(rows[i], train_obj, probabilistic, mode)


def batch_iterator(
    sample_iter: Iterator[Dict[str, np.ndarray]],
    batch_size: int,
    augment_fn=None,
    rng_seed: int = 0,
    prefetch: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Stack per-sample dicts into batches; optionally apply a (jitted,
    batched, on-device) augmentation function keyed per batch.

    ``prefetch`` batches are assembled ahead on a background thread so host
    IO/stacking overlaps device compute (the reference used tf.data's
    prefetch(AUTOTUNE), train_model.py:183).
    """
    import queue
    import threading

    import jax

    key = jax.random.PRNGKey(rng_seed)

    def make_batch():
        samples = [next(sample_iter) for _ in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0].keys()}

    if prefetch and prefetch > 0:
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)

        def producer():
            while True:
                try:
                    q.put(make_batch())
                except Exception as e:  # surface loader errors to the consumer
                    q.put(e)
                    return

        threading.Thread(target=producer, daemon=True).start()

        def batches():
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item

        source = batches()
    else:
        def batches():
            while True:
                yield make_batch()

        source = batches()

    for batch in source:
        if augment_fn is not None:
            key, sub = jax.random.split(key)
            batch = augment_fn(sub, batch)
        yield batch
