"""Microbench of the PallasFullConv hot kernel (layer3 geometry) on the
real edge layout of the bench batch.  Usage: python _kbench.py [fwd|bwd]"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import sys
import time
from functools import partial

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from equivariant_nn_zoo_tpu.data import Batch, GraphBatch
    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.utils import build
    from equivariant_nn_zoo_tpu.nn.message_passing import FactorizedConvolution

    rng = np.random.default_rng(0)
    batch_size = 128
    cfg = get_config("config_energy")
    model = build(cfg.model_config)
    mols = B.synthetic_qm9(batch_size, rng)
    n_nodes = [int(np.asarray(m["pos"]).shape[0]) for m in mols]
    n_edges = [int(np.asarray(m["edge_index"]).shape[-1]) for m in mols]
    head = 1.1 + 2.0 / (batch_size ** 0.5)
    node_cap = max(128, int(np.ceil(batch_size * np.mean(n_nodes) * head / 128) * 128))
    tile = 128
    per_run = max(1, 121 // max(1, int(np.mean(n_nodes))))
    n_runs = int(np.ceil(batch_size / per_run))
    edge_cap = int(np.ceil(
        (batch_size * np.mean(n_edges) * head + n_runs * tile) / tile
    ) * tile)
    gb = GraphBatch.from_batch(Batch.from_data_list(mols), node_cap, edge_cap,
                               batch_size, edge_tile=tile)
    assert gb.dropped == 0
    N, E = node_cap, edge_cap
    print(f"N={N} E={E} tiles={E//tile}")

    convs = {}
    def walk(m, path=""):
        if isinstance(m, FactorizedConvolution):
            convs[path] = m
        for name, ch in getattr(m, "_children", {}).items():
            walk(ch, path + "/" + name)
    walk(model)
    fc = convs["/layer3/conv"]
    k = fc.full_conv
    assert k is not None, "full_conv not built (not on TPU?)"
    in_dim = sum(mi.mul * mi.ir.dim for mi in k.irreps_in)

    key = jax.random.PRNGKey(0)
    params = model.init(key)
    lp = None
    # find layer3 conv params
    p3 = params["layer3"]["conv"]
    x = jax.random.normal(key, (N, in_dim), jnp.float32)
    sh = jax.random.normal(key, (E, k.J_dim), jnp.float32)
    er = jax.random.normal(key, (E, k.fc_dims[0]), jnp.float32)
    er = er * np.asarray(gb.data["_edge_mask"])
    win0 = jnp.asarray(gb.data["_edge_tile_win"])
    tfirst = jnp.asarray(gb.data["_edge_tile_first"])
    tlast = jnp.asarray(gb.data["_edge_tile_last"])
    srcl = jnp.asarray(gb.data["_edge_src_local"])
    dstl = jnp.asarray(gb.data["_edge_dst_local"])

    def run(fcp, linp, x, sh, er):
        return k(fcp, linp, x, er, sh, win0, tfirst, tlast, srcl, dstl, N,
                 pre_scale=1.0 / 3.0)

    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    fcp, linp = p3["fc"], p3["tp"]["linear"]

    if mode in ("fwd", "both"):
        f = jax.jit(lambda a, b, x, sh, er: run(a, b, x, sh, er).sum())
        o = f(fcp, linp, x, sh, er); jax.block_until_ready(o)
        n = 300
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(fcp, linp, x, sh, er)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        print(f"fwd: {dt*1e3:.3f} ms")

    if mode in ("bwd", "both"):
        g = jax.jit(jax.grad(
            lambda a, b, x, sh, er: run(a, b, x, sh, er).sum(),
            argnums=(0, 1, 2, 4),
        ))
        o = g(fcp, linp, x, sh, er); jax.block_until_ready(o)
        n = 300
        t0 = time.perf_counter()
        for _ in range(n):
            o = g(fcp, linp, x, sh, er)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        print(f"fwd+bwd: {dt*1e3:.3f} ms")
        # trace-aggregated split
        import collections
        import glob
        import gzip
        import json
        with jax.profiler.trace("/tmp/kbtrace"):
            for _ in range(20):
                o = g(fcp, linp, x, sh, er)
            jax.block_until_ready(o)
        time.sleep(1)
        tr = sorted(glob.glob("/tmp/kbtrace/**/*.trace.json.gz",
                              recursive=True))[-1]
        ev = json.load(gzip.open(tr)).get("traceEvents", [])
        by = collections.Counter()
        for e in ev:
            a = e.get("args", {})
            if e.get("ph") == "X" and "hlo_category" in a:
                by[e.get("name", "")[:40]] += int(
                    a.get("device_duration_ps", "0")) / 1e9 / 20
        for nm, d in by.most_common(10):
            print(f"  {d:8.3f}  {nm}")


if __name__ == "__main__":
    main()
