#!/usr/bin/env python
"""Benchmarks.

Default (`python bench.py`, the driver contract): QM9 config_energy
training throughput, ONE JSON line
`{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}`.

Other modes (`python bench.py <mode>`): one JSON line per workload.
  energy_force  GradientOutput force training (grad_order=2 Pallas path)
  diffusion     VP-SDE score-model training (config_diffusion)
  hamiltonian   H2O hamiltonian-matrix training (config_hamiltonian)
  e2e           Trainer-path config_energy via the production DataLoader
  all           every mode above plus the headline

Baseline context (BASELINE.md): the reference publishes no throughput
numbers; the driver's north star is >=5x an A100's config_energy training
throughput on a TPU chip.  An A100 running the reference (torch 1.11 +
e3nn 0.4.4 TorchScript, batch 128, 6.1M params, 5 interaction layers)
sustains roughly 1,100 graphs/sec on QM9-sized molecules (per NequIP-era
published benchmarks of the same architecture); vs_baseline is measured
against that estimate.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

A100_REFERENCE_GRAPHS_PER_SEC = 1100.0

# Persistent XLA compilation cache: repeat bench/ablation runs skip the
# server-side compile (the hamiltonian step's first compile is ~20 min).
# Client-side Mosaic lowering still runs (it feeds the cache key).
# Opt out with E3_COMPILE_CACHE=0.
if os.environ.get("E3_COMPILE_CACHE", "1") == "1":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/e3_jax_cache")

# Hang diagnosis: E3_FAULT=<secs> dumps every thread's Python stack to
# stderr that often (a bench phase that goes silent past its expected
# runtime can then be attributed without a debugger on the box).
if os.environ.get("E3_FAULT"):
    try:
        _fault_secs = int(os.environ["E3_FAULT"])
        if _fault_secs <= 0:
            raise ValueError(_fault_secs)
    except ValueError:
        sys.stderr.write(
            "bench: ignoring malformed E3_FAULT=%r (want a positive "
            "integer number of seconds)\n" % os.environ["E3_FAULT"]
        )
    else:
        import faulthandler

        faulthandler.dump_traceback_later(_fault_secs, repeat=True)


# --------------------------------------------------------------- data makers


def synthetic_qm9(n_mol, rng):
    """QM9-like molecules: 4-29 heavy+H atoms, ~1.1 A spacing blobs."""
    from equivariant_nn_zoo_tpu.data import Batch, Data, computeEdgeIndex

    mols = []
    for _ in range(n_mol):
        n = int(rng.integers(8, 24))
        pos = rng.normal(size=(n, 3)) * 1.4
        d = {
            "pos": pos,
            "species": rng.choice([1, 6, 7, 8], size=(n, 1)),
            "total_energy": rng.normal(size=(1, 1)),
        }
        d["atom_types"] = d["species"]
        attrs = {
            "pos": ("node", "1x1o"),
            "species": ("node", "1x0e"),
            "atom_types": ("node", "1x0e"),
            "total_energy": ("graph", "1x0e"),
        }
        out, attrs = computeEdgeIndex(d, attrs, r_max=4.0)
        d.update(out)
        mols.append(Data(attrs, **d))
    return mols


def synthetic_fragments(n_mol, rng, r_max=5.0, num_types=20):
    """Protein-fragment-like molecules with energy+force targets."""
    from equivariant_nn_zoo_tpu.data import Batch, Data, computeEdgeIndex

    mols = []
    for _ in range(n_mol):
        n = int(rng.integers(8, 24))
        d = {
            "pos": rng.normal(size=(n, 3)) * 1.6,
            "species": rng.integers(0, num_types, size=(n, 1)),
            "energy": rng.normal(size=(1, 1)),
            "forces": rng.normal(size=(n, 3)).astype(np.float32),
        }
        d["atom_types"] = d["species"]
        attrs = {
            "pos": ("node", "1x1o"),
            "species": ("node", "1x0e"),
            "atom_types": ("node", "1x0e"),
            "energy": ("graph", "1x0e"),
            "forces": ("node", "1x1o"),
        }
        out, attrs = computeEdgeIndex(d, attrs, r_max=r_max)
        d.update(out)
        mols.append(Data(attrs, **d))
    return mols


def synthetic_diffusion_mols(n_mol, rng, num_types=18):
    """Molecules for the score model: fully-connected edges (r_max=9999,
    reference config_diffusion preprocess), normalized positions."""
    from equivariant_nn_zoo_tpu.data import Batch, Data, computeEdgeIndex

    mols = []
    for _ in range(n_mol):
        n = int(rng.integers(8, 20))
        d = {
            "pos": (rng.normal(size=(n, 3)) * 0.5).astype(np.float32),
            "species": rng.integers(0, num_types, size=(n, 1)),
        }
        d["atom_types"] = d["species"]
        attrs = {
            "pos": ("node", "1x1o"),
            "species": ("node", "1x0e"),
            "atom_types": ("node", "1x0e"),
        }
        out, attrs = computeEdgeIndex(d, attrs, r_max=9999.0)
        d.update(out)
        ne = int(np.asarray(d["edge_index"]).shape[-1])
        d["bond_type"] = rng.integers(0, 4, size=(ne, 1))
        attrs["bond_type"] = ("edge", "1x0e")
        mols.append(Data(attrs, **d))
    return mols


def synthetic_dipole_mols(n_mol, rng, r_max=5.0, num_types=18):
    from equivariant_nn_zoo_tpu.data import Batch, Data, computeEdgeIndex

    mols = []
    for _ in range(n_mol):
        n = int(rng.integers(8, 24))
        d = {
            "pos": rng.normal(size=(n, 3)) * 1.4,
            "species": rng.integers(0, num_types, size=(n, 1)),
            # atomic multipoles: per-NODE l=1 targets (JCTC dataset,
            # reference config_dipole head is a PointwiseLinear, no pooling)
            "dipole": rng.normal(size=(n, 3)).astype(np.float32),
        }
        d["atom_types"] = d["species"]
        attrs = {
            "pos": ("node", "1x1o"),
            "species": ("node", "1x0e"),
            "atom_types": ("node", "1x0e"),
            "dipole": ("node", "1x1o"),
        }
        out, attrs = computeEdgeIndex(d, attrs, r_max=r_max)
        d.update(out)
        mols.append(Data(attrs, **d))
    return mols


def synthetic_h2o(n_mol, rng):
    from equivariant_nn_zoo_tpu.data import Batch, Data, computeEdgeIndex

    mols = []
    base = np.array([[0, 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])
    for _ in range(n_mol):
        d = {
            "pos": base + rng.normal(scale=0.03, size=(3, 3)),
            "species": np.array([[8], [1], [1]]),
            "hamiltonian": rng.normal(size=(1, 576)).astype(np.float32),
        }
        d["atom_types"] = d["species"]
        attrs = {
            "pos": ("node", "1x1o"),
            "species": ("node", "1x0e"),
            "atom_types": ("node", "1x0e"),
            "hamiltonian": ("graph", 576),
        }
        out, attrs = computeEdgeIndex(d, attrs, r_max=4.0)
        d.update(out)
        mols.append(Data(attrs, **d))
    return mols


# ----------------------------------------------------------------- harness


def make_batches(mols, batch_size, n_batches=4, window=128):
    """Tile-aligned device batches at production-estimated capacities,
    bumped until no graph is dropped (the real loader defers instead)."""
    import jax

    from equivariant_nn_zoo_tpu.data import Batch, GraphBatch
    from equivariant_nn_zoo_tpu.data.dataloader import estimate_capacities

    tile = 128 if jax.default_backend() == "tpu" else None
    node_cap, edge_cap = estimate_capacities(
        mols, batch_size, edge_tile=tile, window=window
    )
    while True:
        batches = []
        for b in range(n_batches):
            host = Batch.from_data_list(
                mols[b * batch_size:(b + 1) * batch_size]
            )
            gb = GraphBatch.from_batch(host, node_cap, edge_cap, batch_size,
                                       edge_tile=tile)
            if gb.dropped:
                break
            batches.append(gb)
        if len(batches) == n_batches:
            break
        node_cap += window
        # keep E divisible by B*tile for the tile-batched kernel grid
        from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import \
            _tile_batch_env

        edge_cap += (tile or 128) * _tile_batch_env()
    return [jax.device_put(gb) for gb in batches], node_cap, edge_cap


def measure_steps(step, n_steps=200, trace_check=False, payload=None):
    """Wall-clock over many steps (axon: block_until_ready alone does not
    reliably wait; queue backpressure dominates at a few hundred steps),
    optionally cross-checked against profiler-aggregated device time."""
    import jax

    out = None
    for i in range(8):  # warmup beyond compile
        out = step(i)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n_steps):
        out = step(i)
    jax.block_until_ready(out)
    wall_step = (time.perf_counter() - t0) / n_steps

    if trace_check:
        dev_step = None
        try:
            import glob
            import gzip
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                n_prof = 30
                with jax.profiler.trace(td):
                    for i in range(n_prof):
                        out = step(i)
                    jax.block_until_ready(out)
                time.sleep(0.5)
                traces = sorted(
                    glob.glob(td + "/**/*.trace.json.gz", recursive=True)
                )
                if traces:
                    ev = json.load(gzip.open(traces[-1])).get(
                        "traceEvents", []
                    )
                    tot = 0.0
                    for e in ev:
                        a = e.get("args", {})
                        if e.get("ph") == "X" and "hlo_category" in a:
                            tot += int(
                                a.get("device_duration_ps", "0")
                            ) / 1e12
                    if tot > 0:
                        dev_step = tot / n_prof
        except Exception as e:  # profiling is best-effort
            sys.stderr.write(f"bench trace cross-check unavailable: {e}\n")
        if dev_step is not None:
            skew = abs(dev_step - wall_step) / wall_step
            sys.stderr.write(
                f"bench methodology: wall {wall_step*1e3:.2f} ms/step, "
                f"device {dev_step*1e3:.2f} ms/step, skew {skew:.1%}\n"
            )
            if skew > 0.15:
                sys.stderr.write(
                    "WARNING: wall-clock and trace-aggregated step times "
                    "disagree by >15%; reporting the slower "
                    "(conservative)\n"
                )
                wall_step = max(wall_step, dev_step)
    return wall_step


def kernel_provenance():
    """Which compute paths are live for THIS run (read at emit time, so a
    runtime fallback that flips the env flags is reported truthfully).
    Added after round 3, where a silent pairwise-kernel fallback made an
    XLA number read as a kernel result (VERDICT.md weak #6)."""
    import os

    import jax

    backend = jax.default_backend()
    pallas = backend == "tpu" and os.environ.get("E3_PALLAS", "1") == "1"
    pw = os.environ.get("E3_PALLAS_PAIRWISE", "")
    # savemid silently disables when tile batching is on (fused_conv.py
    # gates it to B == 1), so report the EFFECTIVE state, not the flag.
    tilebatch = int(os.environ.get("E3_PALLAS_TILEBATCH", "1") or 1)
    savemid_flag = os.environ.get("E3_PALLAS_SAVEMID", "1") != "0"
    if savemid_flag and tilebatch > 1:
        sys.stderr.write(
            "bench: E3_PALLAS_SAVEMID is overridden by "
            "E3_PALLAS_TILEBATCH=%d (savemid needs B==1); reporting "
            "savemid=false\n" % tilebatch
        )
    kernels = {
        "conv": pallas,
        "sc": pallas,
        "pairwise": (pallas and pw != "0") or pw == "force",
        "edgeconv": pallas
        and os.environ.get("E3_PALLAS_EDGECONV", "1") == "1",
        "savemid": pallas and savemid_flag and tilebatch == 1,
        # ext (grad_order=2) kernels' streamed-aux variant (the ext path
        # never tile-batches, so no B gate); default off until the
        # on-device A/B lands (fused_conv.py:1908)
        "savemid_ext": pallas
        and os.environ.get("E3_PALLAS_SAVEMID_EXT", "0") == "1",
        # kernel-layout inter-layer handoff (message_passing.py kl):
        # gated features stream between conv layers in node-table layout,
        # skipping the per-layer (m, d) transpose round trip
        "klayout": pallas
        and os.environ.get("E3_KLAYOUT", "1") != "0",
    }
    return {
        "backend": backend,
        "path": "pallas" if pallas else "xla",
        "kernels": kernels,
    }


def emit(metric, graphs_per_sec, extra=None):
    rec = {
        "metric": metric,
        "value": round(graphs_per_sec, 2),
        "unit": "graphs/sec/chip",
    }
    if extra:
        rec.update(extra)
    rec.update(kernel_provenance())
    print(json.dumps(rec))


# ---------------------------------------------------------------- workloads


def bench_energy():
    import jax
    import optax

    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run.loss import Loss
    from equivariant_nn_zoo_tpu.utils import build

    rng = np.random.default_rng(0)
    batch_size = 128
    cfg = get_config("config_energy")
    model = build(cfg.model_config)
    loss_obj = Loss(dict(cfg.loss_coeffs))
    mols = synthetic_qm9(batch_size * 4, rng)
    batches, _, _ = make_batches(mols, batch_size)

    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply(p, batch)
            loss, _ = loss_obj(out.data, batch.data)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    state = [params, opt_state]

    def step(i):
        state[0], state[1], loss = train_step(
            state[0], state[1], batches[i % len(batches)]
        )
        return loss

    wall = measure_steps(step, n_steps=200, trace_check=True)
    gps = batch_size / wall
    emit(
        "qm9_config_energy_train_throughput", gps,
        {"vs_baseline": round(gps / A100_REFERENCE_GRAPHS_PER_SEC, 3)},
    )
    return gps


def bench_energy_force(batch_size=None):
    """Force training: double-differentiates through the net
    (GradientOutput); convs run grad_order=2 (Pallas fwd + first vjp,
    XLA second order)."""
    import jax
    import optax

    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run.loss import Loss
    from equivariant_nn_zoo_tpu.utils import build

    rng = np.random.default_rng(0)
    batch_size = batch_size or 64
    cfg = get_config("config_energy_force")
    model = build(cfg.model_config)
    loss_obj = Loss(dict(cfg.loss_coeffs))
    mols = synthetic_fragments(batch_size * 4, rng,
                               r_max=cfg.model_config.r_max)
    batches, _, _ = make_batches(mols, batch_size)

    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply(p, batch)
            loss, _ = loss_obj(out.data, batch.data)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    state = [params, opt_state]

    def step(i):
        state[0], state[1], loss = train_step(
            state[0], state[1], batches[i % len(batches)]
        )
        return loss

    wall = measure_steps(step, n_steps=150)
    emit("energy_force_train_throughput", batch_size / wall,
         {"ms_per_step": round(wall * 1e3, 2)})


def bench_diffusion():
    import jax
    import optax

    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.models.sde_config import (
        get_config as sde_get_config,
    )
    from equivariant_nn_zoo_tpu.run import sde_utils
    from equivariant_nn_zoo_tpu.utils import build

    rng = np.random.default_rng(0)
    batch_size = 128
    cfg = get_config("config_diffusion")
    sde_cfg = sde_get_config()
    model = build(cfg.model_config)
    mols = synthetic_diffusion_mols(batch_size * 4, rng)
    batches, _, _ = make_batches(mols, batch_size)

    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(cfg.learning_rate)
    state = sde_utils.init_sde_state(params, optimizer, jax.random.PRNGKey(1))
    sde = sde_utils.VPSDE(
        diffusion_keys=dict(cfg.diffusion_keys),
        beta_min=sde_cfg.model.beta_min, beta_max=sde_cfg.model.beta_max,
        N=sde_cfg.model.num_scales,
    )
    step_fn = sde_utils.get_step_fn(
        sde, True, model=model, optimizer=optimizer,
        reduce_mean=sde_cfg.training.reduce_mean, continuous=True,
        grad_clid_norm=cfg.get("grad_clid_norm"),
        ema_decay=sde_cfg.model.ema_rate,
    )
    box = [jax.device_put(state)]

    def step(i):
        box[0], loss, _ = step_fn(box[0], batches[i % len(batches)])
        return loss

    wall = measure_steps(step, n_steps=200)
    emit("diffusion_train_throughput", batch_size / wall,
         {"ms_per_step": round(wall * 1e3, 2)})


def bench_dipole():
    import jax
    import optax

    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run.loss import Loss
    from equivariant_nn_zoo_tpu.utils import build

    rng = np.random.default_rng(0)
    cfg = get_config("config_dipole")
    batch_size = int(cfg.batch_size)
    model = build(cfg.model_config)
    loss_obj = Loss(dict(cfg.loss_coeffs))
    mols = synthetic_dipole_mols(batch_size * 4, rng,
                                 r_max=cfg.model_config.r_max)
    batches, _, _ = make_batches(mols, batch_size)

    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply(p, batch)
            loss, _ = loss_obj(out.data, batch.data)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    state = [params, opt_state]

    def step(i):
        state[0], state[1], loss = train_step(
            state[0], state[1], batches[i % len(batches)]
        )
        return loss

    wall = measure_steps(step, n_steps=200)
    emit("dipole_train_throughput", batch_size / wall,
         {"ms_per_step": round(wall * 1e3, 2)})


def bench_hamiltonian(batch_size=None):
    import os

    import jax
    import optax

    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run.loss import Loss
    from equivariant_nn_zoo_tpu.utils import build

    rng = np.random.default_rng(0)
    cfg = get_config("config_hamiltonian")
    batch_size = int(batch_size or cfg.batch_size)
    loss_obj = Loss(dict(cfg.loss_coeffs))
    mols = synthetic_h2o(batch_size * 4, rng)
    batches, _, _ = make_batches(mols, batch_size)

    def make_step():
        model = build(cfg.model_config)
        params = model.init(jax.random.PRNGKey(0))
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(params)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch):
            def loss_fn(p):
                out = model.apply(p, batch)
                loss, _ = loss_obj(out.data, batch.data)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return train_step, params, opt_state

    train_step, params, opt_state = make_step()
    fell_back = False
    t_compile0 = time.perf_counter()
    try:  # compile check: fall back to the XLA head if a kernel rejects
        params, opt_state, l0 = train_step(params, opt_state, batches[0])
        jax.block_until_ready(l0)
        print(f"hamiltonian first step (lower+compile+run): "
              f"{time.perf_counter() - t_compile0:.0f}s", file=sys.stderr)
    except Exception as e:  # pragma: no cover - TPU-compile guard
        print(f"pairwise kernel path failed ({type(e).__name__}); "
              "falling back to E3_PALLAS_PAIRWISE=0", file=sys.stderr)
        os.environ["E3_PALLAS_PAIRWISE"] = "0"
        os.environ["E3_PALLAS_EDGECONV"] = "0"
        fell_back = True
        train_step, params, opt_state = make_step()

    state = [params, opt_state]

    def step(i):
        state[0], state[1], loss = train_step(
            state[0], state[1], batches[i % len(batches)]
        )
        return loss

    wall = measure_steps(step, n_steps=300)
    emit("hamiltonian_train_throughput", batch_size / wall,
         {"ms_per_step": round(wall * 1e3, 2), "batch_size": batch_size,
          "fallback": fell_back})


def bench_e2e():
    """config_energy through the PRODUCTION path: synthetic QM9-format HDF5
    -> CondensedDataset -> DataLoader (quantile capacities, deferral, cache,
    thread workers) -> Trainer.batch_step.  The number the user gets."""
    import os
    import h5py
    import jax

    from equivariant_nn_zoo_tpu.data.compute_edge import computeEdgeIndex
    from equivariant_nn_zoo_tpu.data.dataset import CondensedDataset
    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.run import Trainer
    from equivariant_nn_zoo_tpu.utils import build

    rng = np.random.default_rng(0)
    path = "/tmp/bench_e2e_qm9.hdf5"
    if not os.path.exists(path):
        E_SP = {1: -16.4, 6: -1036.0, 7: -1489.0, 8: -2047.0}
        Rs, Zs, Us, nn = [], [], [], []
        for _ in range(8192):
            n = int(rng.integers(8, 24))
            pos = rng.normal(size=(n, 3)) * 1.4
            z = rng.choice([1, 6, 7, 8], size=(n, 1), p=[0.5, 0.3, 0.1, 0.1])
            dm = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
            pair = np.exp(-dm[np.triu_indices(n, 1)]).sum()
            Rs.append(pos)
            Zs.append(z)
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
        model=model, workdir="/tmp/bench_e2e_wd", seed=0,
        data_config={"n_train": 7680, "n_val": 512, "shuffle": True,
                     "num_workers": 4, "cache_preprocessed": True},
        loss_coeffs={"total_energy": [1.0, "MSELoss"]},
        metrics_components={"total_energy": ["mae"]},
        metric_key="validation_loss", learning_rate=1e-2,
        optimizer_name="Adam", lr_scheduler_name="none",
        use_ema=True, max_epochs=4, batch_size=128, log_period=10000,
        save_period=0,
    )
    tr.set_dataset(ds)
    tr.init_metrics()
    best, best_split = 0.0, {}
    for epoch in range(3):
        n = 0
        t_next = t_step = 0.0
        t0 = time.perf_counter()
        # same path as Trainer.epoch_step: async device placement one
        # batch ahead so the tunnel's per-leaf H2D latency overlaps compute
        it = tr._device_prefetch(iter(tr.dl_train))
        while True:
            ta = time.perf_counter()
            batch = next(it, None)
            tb = time.perf_counter()
            if batch is None:
                break
            tr.batch_step(batch)
            t_next += tb - ta
            t_step += time.perf_counter() - tb
            n += 1
        jax.block_until_ready(tr.params)
        dt = time.perf_counter() - t0
        if epoch > 0 and n * 128 / dt > best:
            # host-side split: waiting on the prefetch iterator (loader
            # pack + H2D) vs dispatch+bookkeeping in batch_step
            best = n * 128 / dt
            best_split = {
                "ms_loader_wait": round(t_next / n * 1e3, 2),
                "ms_dispatch": round(t_step / n * 1e3, 2),
                "ms_per_batch": round(dt / n * 1e3, 2),
            }
    emit("qm9_config_energy_e2e_trainer_throughput", best,
         {"dropped_graphs": int(tr.dl_train.dropped_graphs), **best_split})


def bench_parity():
    """On-device kernel parity gate: run the conv (+ext/grad2) and pairwise
    parity harnesses as subprocesses and emit one JSON line per check, so
    every hardware bench queue re-proves fwd+grad parity before timing
    (VERDICT r4 weak #4 — interpret-mode CI can miss Mosaic regressions)."""
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    checks = [
        ("conv_parity", [sys.executable,
                         os.path.join(root, "tools", "_convparity.py")]),
        ("pairwise_parity", [sys.executable,
                             os.path.join(root, "tools", "_pwparity.py")]),
    ]
    n_fail = 0
    for name, cmd in checks:
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=root, capture_output=True, text=True, timeout=2400
        )
        ok = proc.returncode == 0
        n_fail += 0 if ok else 1
        # surface the harness's own report (rel-linf per output) for the log
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        emit(name, 1.0 if ok else 0.0, {
            "unit": "ok",
            "seconds": round(time.time() - t0, 1),
        })
    if n_fail:
        raise SystemExit(f"{n_fail} parity check(s) FAILED")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "energy"
    if mode == "energy":
        bench_energy()
    elif mode == "energy_force":
        bench_energy_force(
            batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else None
        )
    elif mode == "diffusion":
        bench_diffusion()
    elif mode == "dipole":
        bench_dipole()
    elif mode == "hamiltonian":
        bench_hamiltonian(
            batch_size=int(sys.argv[2]) if len(sys.argv) > 2 else None
        )
    elif mode == "e2e":
        bench_e2e()
    elif mode == "parity":
        bench_parity()
    elif mode == "all":
        bench_energy()
        bench_energy_force()
        bench_diffusion()
        bench_dipole()
        bench_hamiltonian()
        bench_e2e()
    else:
        raise SystemExit(f"unknown bench mode {mode!r}")


if __name__ == "__main__":
    sys.exit(main())
