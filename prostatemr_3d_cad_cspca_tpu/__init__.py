"""prostatemr_3d_cad_cspca_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for
clinically-significant prostate-cancer detection in biparametric MRI.

A ground-up re-design of the capabilities of the reference stack
DIAGNijmegen/prostateMR_3D-CAD-csPCa (TF2.5, single-GPU) as an idiomatic
JAX framework: pure-functional Flax modules, explicit PRNG plumbing,
pjit/shard_map SPMD parallelism over device meshes, and Pallas TPU kernels
for the memory-bound hot ops.

Public surface (mirrors the reference's importable modules):
  - models.M1         — top-level model API (reference: tf2.5/scripts/model/unets/networks.py:24)
  - models.m1         — mid-level builder    (reference: networks.py:232)
  - models.M1Core     — backbone             (reference: networks.py:402)
  - losses            — Focal / ELBO-KL / SoftDice+Boundary (reference: model/losses.py)
  - augment           — fused on-device train-time augmentations (reference: model/augmentations.py)
  - data              — manifests, generators, preprocessing (reference: data_generators.py, preprocess.py)
  - train             — schedules, trainer, callbacks, metrics (reference: train_model.py, callbacks.py)
  - parallel          — mesh/sharding/halo-exchange utilities (TPU-native; reference had only MirroredStrategy)
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import losses  # noqa: F401

from .models import M1, M1Core, m1  # noqa: F401
from .infer import (  # noqa: F401
    make_chunked_batch_fn,
    mc_predict,
    sliding_window_predict,
)
from .augment import AugmentParams, augment_batch  # noqa: F401
from .ensemble import M1Ensemble, tta_detect  # noqa: F401
