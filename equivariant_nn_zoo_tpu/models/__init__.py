"""Named workload configs — the model zoo.

Reference parity: e3_layers/configs/__init__.py (7 named configs) plus the
layer-config builders.  Select with ``get_config(name)`` or
``CONFIG_REGISTRY[name](spec)``.
"""

from . import layer_configs
from .config_energy import get_config as config_energy

CONFIG_REGISTRY = {
    "config_energy": config_energy,
}


def get_config(name: str, spec=None):
    if name not in CONFIG_REGISTRY:
        raise KeyError(
            f"unknown config {name!r}; available: {sorted(CONFIG_REGISTRY)}"
        )
    return CONFIG_REGISTRY[name](spec)


def register_config(name: str, fn):
    CONFIG_REGISTRY[name] = fn
