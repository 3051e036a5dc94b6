"""Data pipeline: manifests, generators, host/device preprocessing."""

from .generators import (  # noqa: F401
    batch_iterator,
    contour_smoothening,
    custom_data_generator,
    load_sample,
)
from .manifest import read_manifest, read_xlsx  # noqa: F401
from .preprocess import (  # noqa: F401
    center_crop,
    resample_img,
    resize_image_with_crop_or_pad,
    whitening,
    whitening_device,
)
