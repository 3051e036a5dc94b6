"""Model family: blocks, M1Core backbone, M1 wiring and top-level API."""

from .blocks import (  # noqa: F401
    AxisAligned3DConvGaussian,
    ConfigurableDropout,
    Conv1x1x1withLatentDist,
    GridAttentionBlock3D,
    MonteCarloDropout,
    SEResNetBottleNeck,
    StitchingProbDecoder,
)
from .m1_core import M1Core  # noqa: F401
from .m1_net import M1CascadedNet, M1Net, decision_fusion  # noqa: F401
from .m1 import M1, m1  # noqa: F401
