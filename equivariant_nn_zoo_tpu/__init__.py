"""equivariant_nn_zoo_tpu — a TPU-native E(3)-equivariant neural network
framework with the capabilities of 20171130/Equivariant-NN-Zoo, rebuilt from
scratch on JAX/XLA/Pallas/pjit.

Subpackages:
- ops:      irreps algebra, Wigner/CG tables, spherical harmonics, tensor
            products, equivariant nonlinearities, segment ops, Pallas kernels.
- data:     padded static-shape graph batches, HDF5 datasets, edge building.
- nn:       the layer zoo (embeddings, message passing, output heads) and the
            key-matched sequential DAG executor.
- run:      trainer, losses, metrics, early stopping, SDE diffusion, samplers.
- models:   named workload configs (energy, forces, dipole, hamiltonian,
            diffusion) — the model definitions, as data.
- parallel: device mesh / sharding helpers (DP over ICI via pjit).
- utils:    build/reflection, key mapping, atomic async checkpoint IO, stats.
"""

__version__ = "0.1.0"
