"""Trainer-level TPU soak: real DataLoader (tile-aligned quantile
capacities + overflow deferral) driving the jitted train step on synthetic
QM9-format HDF5; reports sustained graphs/sec vs bench.py."""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import os
import time

import h5py
import numpy as np


def main():
    import jax

    from equivariant_nn_zoo_tpu.data.compute_edge import computeEdgeIndex
    from equivariant_nn_zoo_tpu.data.dataset import CondensedDataset
    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run import Trainer
    from equivariant_nn_zoo_tpu.utils import build
    from functools import partial

    rng = np.random.default_rng(0)
    path = "/tmp/soak_qm9.hdf5"
    E_SP = {1: -16.4, 6: -1036.0, 7: -1489.0, 8: -2047.0}
    Rs, Zs, Us, nn = [], [], [], []
    for _ in range(8192):
        n = int(rng.integers(8, 24))
        pos = rng.normal(size=(n, 3)) * 1.4
        z = rng.choice([1, 6, 7, 8], size=(n, 1), p=[0.5, 0.3, 0.1, 0.1])
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        pair = np.exp(-d[np.triu_indices(n, 1)]).sum()
        Rs.append(pos); Zs.append(z)
        Us.append([sum(E_SP[int(s)] for s in z[:, 0]) + 3.0 * pair])
        nn.append([n])
    with h5py.File(path, "w") as f:
        f["R"] = np.concatenate(Rs).astype(np.float32)
        f["Z"] = np.concatenate(Zs).astype(np.int64)
        f["U0"] = np.asarray(Us, np.float32)
        f["_n_nodes"] = np.asarray(nn, np.int64)
        f.attrs["R"] = ("node", "1x1o")
        f.attrs["Z"] = ("node", "1x0e")
        f.attrs["U0"] = ("graph", "1x0e")
        f.attrs["_n_nodes"] = ("graph", "1x0e")

    cfg = get_config("config_energy")
    model = build(cfg.model_config)
    ds = CondensedDataset(
        path=path,
        key_map={"Z": ("species", "atom_types"), "R": "pos",
                 "U0": "total_energy"},
        preprocess=[partial(computeEdgeIndex, r_max=4.0)],
        type_names=cfg.data_config.type_names,
        cache_preprocessed=True,
    )
    tr = Trainer(
        model=model, workdir="/tmp/soak_wd", seed=0,
        data_config={"n_train": 7680, "n_val": 512, "shuffle": True,
                     "num_workers": 4, "cache_preprocessed": True},
        loss_coeffs={"total_energy": [1.0, "MSELoss"]},
        metrics_components={"total_energy": ["mae"]},
        metric_key="validation_loss", learning_rate=1e-2,
        optimizer_name="Adam", lr_scheduler_name="none",
        use_ema=True, max_epochs=2, batch_size=128, log_period=10000,
        save_period=0,
    )
    tr.set_dataset(ds)
    print("caps:", tr.dl_train.node_capacity, tr.dl_train.edge_capacity,
          "tile:", tr.dl_train.edge_tile)
    tr.init_metrics()
    import jax

    for epoch in range(3):
        n = 0
        t0 = time.perf_counter()
        for batch in tr._device_prefetch(iter(tr.dl_train)):
            tr.batch_step(batch)
            n += 1
        jax.block_until_ready(tr.params)
        dt = time.perf_counter() - t0
        gps = n * 128 / dt
        tag = " (compile+cache-fill)" if epoch == 0 else ""
        print(f"epoch {epoch}: {n} steps, {gps:.0f} graphs/sec{tag}; "
              f"dropped={tr.dl_train.dropped_graphs}")
    print("bench.py step-only reference: ~4071 graphs/sec")


if __name__ == "__main__":
    main()
