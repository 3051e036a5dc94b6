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
    with_dist_map: bool = False,
) -> Dict[str, np.ndarray]:
    """One case -> model I/O dict (reference data_generators.py:43-88).

    ``with_dist_map`` additionally yields the signed EDT of the foreground
    label channels (key ``dist_map``) for the boundary loss — labels are
    static per case, so the EDT is data, not per-step model compute (the
    reference recomputes it every step inside tf.py_function,
    losses.py:82-96; precomputing removes that host stall from the hot loop).
    """
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
        sample = {
            "image": np.concatenate([image, postq_lbl], axis=-1),
            "detection": label,
            "KL": np.zeros(label.shape, np.float32),
        }
    else:
        sample = {"image": image, "detection": label}
    if with_dist_map:
        from ..ops.edt import signed_distance_map

        sample["dist_map"] = signed_distance_map(label[..., 1:])
    return sample


def custom_data_generator(
    data_manifest: str,
    train_obj: str = "zonal",
    probabilistic: bool = False,
    mode: str = "train",
    shuffle_seed: Optional[int] = None,
    with_dist_map: bool = False,
    cache_dir: Optional[str] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite per-sample generator (reference data_generators.py:30-88),
    with optional deterministic per-epoch shuffling.

    ``cache_dir`` implements the reference's --CACHE_TDS_PATH
    (tf.data snapshot cache, train_model.py:177-181): the first pass writes
    each prepared sample (incl. contour smoothening and the optional EDT) as
    an .npz keyed by case id + preparation recipe; later passes and epochs
    replay from disk instead of re-preparing.
    """
    import os

    rows = read_manifest(data_manifest)
    rng = np.random.default_rng(shuffle_seed) if shuffle_seed is not None else None
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)

    def prepare(row) -> Dict[str, np.ndarray]:
        if not cache_dir:
            return load_sample(row, train_obj, probabilistic, mode, with_dist_map)
        pid = str(row.get("p-id", "")) or os.path.basename(row["image_path"])
        recipe = f"{train_obj}-{'p' if probabilistic else 'd'}-{mode}" \
                 f"{'-edt' if with_dist_map else ''}"
        path = os.path.join(cache_dir, f"{pid}.{recipe}.npz")
        if os.path.isfile(path):
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        sample = load_sample(row, train_obj, probabilistic, mode, with_dist_map)
        tmp = path + ".tmp.npz"
        np.savez(tmp, **sample)
        os.replace(tmp, path)  # atomic: concurrent fold workers race-safe
        return sample

    for epoch in itertools.count():
        order = np.arange(len(rows))
        if rng is not None:
            rng.shuffle(order)
        for i in order:
            yield prepare(rows[i])


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
    prefetch(AUTOTUNE), train_model.py:183). The thread shuts down when the
    returned generator is closed/garbage-collected (generator ``finally``),
    so library callers can drop the iterator without leaking a producer.
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
        stop = threading.Event()

        def producer():
            while not stop.is_set():
                try:
                    item = make_batch()
                except Exception as e:  # surface loader errors to the consumer
                    item = e
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.25)
                        break
                    except queue.Full:
                        continue
                if isinstance(item, Exception):
                    return

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        def batches():
            try:
                while True:
                    item = q.get()
                    if isinstance(item, Exception):
                        raise item
                    yield item
            finally:
                stop.set()

        source = batches()
    else:
        def batches():
            while True:
                yield make_batch()

        source = batches()

    try:
        for batch in source:
            if augment_fn is not None:
                key, sub = jax.random.split(key)
                batch = augment_fn(sub, batch)
            yield batch
    finally:
        source.close()
