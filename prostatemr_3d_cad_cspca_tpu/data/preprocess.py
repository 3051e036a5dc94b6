"""Offline preprocessing utilities (reference: tf2.5/scripts/preprocess.py).

  * whitening                     — :29-39 (percentile clip + z-score)
  * center_crop                   — :42-49
  * resample_img                  — :52-71 (SimpleITK; gated — stays host-side)
  * resize_image_with_crop_or_pad — :74-98 (DLTK-style symmetric crop/pad)

``whitening``/``center_crop``/``crop_or_pad`` also have jnp twins usable
inside jit for device-resident preprocessing of already-loaded volumes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - not in this image; keep the API surface
    import SimpleITK as sitk

    _HAS_SITK = True
except Exception:  # pragma: no cover
    sitk = None
    _HAS_SITK = False


def whitening(image: np.ndarray, percentile: Optional[float] = None) -> np.ndarray:
    """Z-score whitening with optional symmetric percentile clip
    (reference preprocess.py:29-39)."""
    image = image.astype(np.float32)
    if percentile is not None:
        image = np.clip(
            image,
            np.percentile(image, 100 - percentile),
            np.percentile(image, percentile),
        )
    mean, std = np.mean(image), np.std(image)
    return (image - mean) / std if std > 0 else image * 0.0


def center_crop(
    img: np.ndarray,
    cropz: int,
    cropx: int,
    cropy: int,
    center_2d_coords: Optional[Tuple[float, float]] = None,
    multi_channel: bool = False,
) -> np.ndarray:
    """Center crop, optionally around in-plane coordinates
    (reference preprocess.py:42-49)."""
    if center_2d_coords:
        x, y = center_2d_coords
    else:
        x, y = img.shape[1] // 2, img.shape[2] // 2
    startz = img.shape[0] // 2 - (cropz // 2)
    startx = int(x) - (cropx // 2)
    starty = int(y) - (cropy // 2)
    sl = (
        slice(startz, startz + cropz),
        slice(startx, startx + cropx),
        slice(starty, starty + cropy),
    )
    return img[sl + (slice(None),)] if multi_channel else img[sl]


def resample_img(itk_image, out_spacing=(2.0, 2.0, 2.0), is_label: bool = False):
    """SimpleITK spacing resample: B-spline for images, nearest for labels
    (reference preprocess.py:52-71). Requires SimpleITK (host-side only)."""
    if not _HAS_SITK:
        raise ImportError(
            "SimpleITK is not available in this environment; resample_img is "
            "a host-side ingest utility and needs it. Preprocessed .npy "
            "volumes (the training input format) do not."
        )
    original_spacing = itk_image.GetSpacing()
    original_size = itk_image.GetSize()
    out_size = [
        int(np.round(original_size[i] * (original_spacing[i] / out_spacing[i])))
        for i in range(3)
    ]
    resample = sitk.ResampleImageFilter()
    resample.SetOutputSpacing(tuple(out_spacing))
    resample.SetSize(out_size)
    resample.SetOutputDirection(itk_image.GetDirection())
    resample.SetOutputOrigin(itk_image.GetOrigin())
    resample.SetTransform(sitk.Transform())
    resample.SetDefaultPixelValue(itk_image.GetPixelIDValue())
    resample.SetInterpolator(
        sitk.sitkNearestNeighbor if is_label else sitk.sitkBSpline
    )
    return resample.Execute(itk_image)


def resize_image_with_crop_or_pad(
    image: np.ndarray, img_size: Sequence[int] = (64, 64, 64), **kwargs
) -> np.ndarray:
    """Symmetric crop-or-pad to a fixed size (reference preprocess.py:74-98)."""
    assert isinstance(image, (np.ndarray, np.generic))
    assert image.ndim - 1 == len(img_size) or image.ndim == len(img_size), (
        "Example size doesnt fit image size"
    )
    rank = len(img_size)
    from_indices = [[0, image.shape[d]] for d in range(rank)]
    to_padding = [[0, 0] for _ in range(rank)]
    slicer = [slice(None)] * image.ndim
    for i in range(rank):
        if image.shape[i] < img_size[i]:
            to_padding[i][0] = (img_size[i] - image.shape[i]) // 2
            to_padding[i][1] = img_size[i] - image.shape[i] - to_padding[i][0]
        else:
            from_indices[i][0] = int(np.floor((image.shape[i] - img_size[i]) / 2.0))
            from_indices[i][1] = from_indices[i][0] + img_size[i]
        slicer[i] = slice(from_indices[i][0], from_indices[i][1])
    if image.ndim > rank:
        to_padding = to_padding + [[0, 0]] * (image.ndim - rank)
    return np.pad(image[tuple(slicer)], to_padding, **kwargs)


# ------------------------------------------------------------------ jnp twins
def whitening_device(image, percentile: Optional[float] = None):
    """jit-safe z-score whitening (device-resident path)."""
    import jax.numpy as jnp

    image = image.astype(jnp.float32)
    if percentile is not None:
        lo = jnp.percentile(image, 100 - percentile)
        hi = jnp.percentile(image, percentile)
        image = jnp.clip(image, lo, hi)
    mean, std = jnp.mean(image), jnp.std(image)
    return jnp.where(std > 0, (image - mean) / std, image * 0.0)
