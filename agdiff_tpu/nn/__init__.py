from agdiff_tpu.nn.common import (  # noqa: F401
    ShiftedSoftplus,
    MaskedBatchNorm,
    torch_linear_init,
    torch_bias_init,
)
from agdiff_tpu.nn.mlp import MultiLayerPerceptron  # noqa: F401
from agdiff_tpu.nn.edge_encoders import (  # noqa: F401
    AsymmetricSineCosineSmearing,
    GaussianSmearingEdgeEncoder,
    MLPEdgeEncoder,
    SymmetricCosineSmearing,
    get_edge_encoder,
)
from agdiff_tpu.nn.schnet import (  # noqa: F401
    CFConv,
    InteractionBlock,
    AdaptiveScalingModule,
    DistanceWeightingNetwork,
    SchNetEncoder,
)
from agdiff_tpu.nn.gin import GINEConv, GINEncoder  # noqa: F401
