"""Alias package: the reference exposes its model zoo as ``e3_layers.configs``
(configs/__init__.py:1-7); this mirrors that import path onto ``models``."""

from ..models import (  # noqa: F401
    CONFIG_REGISTRY,
    config_diffusion,
    config_diffusion_CA,
    config_diffusion_backbone,
    config_dipole,
    config_energy,
    config_energy_force,
    config_hamiltonian,
    get_config,
    layer_configs,
    register_config,
)
