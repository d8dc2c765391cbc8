from .module import Module, Lambda
from .sequential import SequentialGraphNetwork
from .mlp import FullyConnectedNet
from .embedding import (
    BesselBasis,
    Broadcast,
    OneHotEncoding,
    PolynomialCutoff,
    RadialBasisEncoding,
    RelativePositionEncoding,
    SphericalEncoding,
    poly_cutoff,
    symmetric_cutoff,
)
from .pointwise import (
    Concat,
    LayerNormalization,
    PointwiseLinear,
    ResBlock,
    Split,
    TensorProductExpansion,
)
from .message_passing import FactorizedConvolution, MessagePassing
from .output import GradientOutput, Pairwise, Pooling, TensorProductContraction
from .scaling import PerTypeScaleShift

__all__ = [
    "Module",
    "Lambda",
    "SequentialGraphNetwork",
    "FullyConnectedNet",
    "BesselBasis",
    "Broadcast",
    "OneHotEncoding",
    "PolynomialCutoff",
    "RadialBasisEncoding",
    "RelativePositionEncoding",
    "SphericalEncoding",
    "poly_cutoff",
    "symmetric_cutoff",
    "Concat",
    "LayerNormalization",
    "PointwiseLinear",
    "ResBlock",
    "Split",
    "TensorProductExpansion",
    "FactorizedConvolution",
    "MessagePassing",
    "GradientOutput",
    "Pairwise",
    "Pooling",
    "TensorProductContraction",
    "PerTypeScaleShift",
]
