"""Named workload configs — the model zoo.

Reference parity: e3_layers/configs/__init__.py (7 named configs) plus the
layer-config builders.  Select with ``get_config(name)`` or
``CONFIG_REGISTRY[name](spec)``.
"""

from . import layer_configs
from .config_energy import get_config as config_energy
from .config_energy_force import get_config as config_energy_force
from .config_dipole import get_config as config_dipole
from .config_hamiltonian import get_config as config_hamiltonian
from .config_diffusion import get_config as config_diffusion
from .config_diffusion_CA import get_config as config_diffusion_CA
from .config_diffusion_backbone import get_config as config_diffusion_backbone

CONFIG_REGISTRY = {
    "config_energy": config_energy,
    "config_energy_force": config_energy_force,
    "config_dipole": config_dipole,
    "config_hamiltonian": config_hamiltonian,
    "config_diffusion": config_diffusion,
    "config_diffusion_CA": config_diffusion_CA,
    "config_diffusion_backbone": config_diffusion_backbone,
}


def get_config(name: str, spec=None):
    if name not in CONFIG_REGISTRY:
        raise KeyError(
            f"unknown config {name!r}; available: {sorted(CONFIG_REGISTRY)}"
        )
    return CONFIG_REGISTRY[name](spec)


def register_config(name: str, fn):
    CONFIG_REGISTRY[name] = fn
