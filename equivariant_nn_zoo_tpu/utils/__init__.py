from .utils import (
    ATOMIC_SYMBOLS,
    build,
    countParameters,
    default_type_names,
    getScaler,
    insertAfter,
    keyMap,
    pruneArgs,
    replace,
)
from ..ops.gate import activations
from ..ops.irreps import tp_path_exists

__all__ = [
    "ATOMIC_SYMBOLS",
    "build",
    "countParameters",
    "default_type_names",
    "getScaler",
    "insertAfter",
    "keyMap",
    "pruneArgs",
    "replace",
    "activations",
    "tp_path_exists",
]
