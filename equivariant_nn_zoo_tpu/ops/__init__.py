from .irreps import Irrep, Irreps, MulIrrep, tp_path_exists, irreps_dim
from .wigner import wigner_3j, cg_component, wigner_d, irrep_d, irreps_d, rand_matrix
from .spherical_harmonics import spherical_harmonics
from .tensor_product import TensorProduct, Linear, fully_connected_tp, Instruction
from .gate import Gate, NormActivation, activations, resolve_activation, normalize2mom
from .segment import segment_sum, segment_mean, scatter

__all__ = [
    "Irrep",
    "Irreps",
    "MulIrrep",
    "tp_path_exists",
    "irreps_dim",
    "wigner_3j",
    "cg_component",
    "wigner_d",
    "irrep_d",
    "irreps_d",
    "rand_matrix",
    "spherical_harmonics",
    "TensorProduct",
    "Linear",
    "fully_connected_tp",
    "Instruction",
    "Gate",
    "NormActivation",
    "activations",
    "resolve_activation",
    "normalize2mom",
    "segment_sum",
    "segment_mean",
    "scatter",
]
