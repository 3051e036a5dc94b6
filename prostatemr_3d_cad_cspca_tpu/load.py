"""One checkpoint-spec loader shared by the serve / export / evaluate CLIs.

Spec grammar (the reference's deployment unit is a cross-validation fold
ensemble, reference train_model.py:101-104):
  "ckpt.npz"              -> M1.load
  "f1.npz,f2.npz,..."     -> ensemble.M1Ensemble.load (ONE vmapped program)
  "artifact.zip"          -> export.ExportedModel.load (AOT StableHLO),
                             only where the caller can serve from a frozen
                             program (allow_artifact=True)
"""

from __future__ import annotations

__all__ = ["load_model_spec"]


def load_model_spec(spec: str, seed: int = 0, allow_artifact: bool = False):
    """Resolve a --MODEL argument to a loaded model object."""
    paths = [p.strip() for p in str(spec).split(",") if p.strip()]
    if not paths:
        raise ValueError(f"empty --MODEL spec: {spec!r}")
    if len(paths) == 1 and paths[0].endswith(".zip"):
        if not allow_artifact:
            raise ValueError(
                f"{paths[0]}: AOT artifacts are frozen inference programs "
                "(serve-only); this command needs a live checkpoint "
                "(.npz) or a comma-separated fold ensemble")
        from .export import ExportedModel

        return ExportedModel.load(paths[0], seed=seed)
    if len(paths) > 1:
        from .ensemble import M1Ensemble

        return M1Ensemble.load(paths)
    from .models.m1 import M1

    return M1.load(paths[0])
