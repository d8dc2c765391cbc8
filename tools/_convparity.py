#!/usr/bin/env python
"""On-device parity: PallasFullConv (+ ext/grad2 path) vs the XLA fused path.

Runs on whatever backend jax selects (the real TPU under axon) — the
hardware-evidence counterpart of tests/test_pallas.py's full-conv cases,
which run in interpret mode on CPU.  Exercises the layer3 geometry of the
headline config on the real bench edge layout: forward + all first-order
gradients of the in-kernel-MLP path, and forward + gradients of the
external-weight (grad_order=2) path, in f32 (tight) and bf16 (loose).

Usage: python _convparity.py
"""
import os as _os, sys as _sys; _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root for direct runs
import sys

import numpy as np

import bench as B


def _maxrel(a, b):
    denom = max(float(np.abs(np.asarray(b, np.float32)).max()), 1e-6)
    return float(np.abs(np.asarray(a, np.float32)
                        - np.asarray(b, np.float32)).max()) / denom


def main():
    import jax
    import jax.numpy as jnp

    from equivariant_nn_zoo_tpu.data import Batch, GraphBatch
    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.nn.message_passing import (
        FactorizedConvolution,
    )
    from equivariant_nn_zoo_tpu.ops.fused_tp import FusedUVUConv
    from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasFullConv
    from equivariant_nn_zoo_tpu.utils import build

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    batch_size = 128
    cfg = get_config("config_energy")
    model = build(cfg.model_config)
    mols = B.synthetic_qm9(batch_size, rng)
    n_nodes = [int(np.asarray(m["pos"]).shape[0]) for m in mols]
    n_edges = [int(np.asarray(m["edge_index"]).shape[-1]) for m in mols]
    head = 1.1 + 2.0 / (batch_size ** 0.5)
    node_cap = max(128, int(np.ceil(
        batch_size * np.mean(n_nodes) * head / 128) * 128))
    tile = 128
    per_run = max(1, 121 // max(1, int(np.mean(n_nodes))))
    n_runs = int(np.ceil(batch_size / per_run))
    edge_cap = int(np.ceil(
        (batch_size * np.mean(n_edges) * head + n_runs * tile) / tile
    ) * tile)
    gb = GraphBatch.from_batch(Batch.from_data_list(mols), node_cap,
                               edge_cap, batch_size, edge_tile=tile)
    assert gb.dropped == 0
    N, E = node_cap, edge_cap
    print(f"N={N} E={E} tiles={E // tile}")

    convs = {}

    def walk(m, path=""):
        if isinstance(m, FactorizedConvolution):
            convs[path] = m
        for name, ch in getattr(m, "_children", {}).items():
            walk(ch, path + "/" + name)

    walk(model)
    fc_layer = convs["/layer3/conv"]
    tpe, fcnet = fc_layer.tp, fc_layer.fc

    params = model.init(jax.random.PRNGKey(0))
    p3 = params["layer3"]["conv"]
    fcp, linp = p3["fc"], p3["tp"]["linear"]
    in_dim = tpe.tp.irreps_in1.dim
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (N, in_dim), jnp.float32)
    sh = jax.random.normal(k2, (E, 9), jnp.float32)
    er = jax.random.normal(k3, (E, fcnet.dims[0]), jnp.float32)
    er = er * jnp.asarray(np.asarray(gb.data["_edge_mask"]), jnp.float32)
    win0 = jnp.asarray(gb.data["_edge_tile_win"])
    tfirst = jnp.asarray(gb.data["_edge_tile_first"])
    tlast = jnp.asarray(gb.data["_edge_tile_last"])
    srcl = jnp.asarray(gb.data["_edge_src_local"])
    dstl = jnp.asarray(gb.data["_edge_dst_local"])
    src = jnp.asarray(gb.data["edge_index"][0])
    dst = jnp.asarray(gb.data["edge_index"][1])

    def ref_out(fcp_, lp_, x_, sh_, er_):
        fused = FusedUVUConv(tpe, compute_dtype=jnp.float32)
        w = fcnet.apply(fcp_, er_, compute_dtype="float32")
        return fused(lp_, x_, src, dst, sh_, w, N, pre_scale=0.5)

    ct = jax.random.normal(jax.random.PRNGKey(7),
                           ref_out(fcp, linp, x, sh, er).shape, jnp.float32)

    def loss_of(fn):
        def loss(fcp_, lp_, x_, sh_, er_):
            return jnp.sum(fn(fcp_, lp_, x_, sh_, er_).astype(jnp.float32)
                           * ct)
        return loss

    # Ground truth at HIGHEST matmul precision: on TPU the DEFAULT
    # precision runs f32 matmuls as single bf16 MXU passes, so the XLA
    # reference differs from ITSELF by ~5.6e-3 (measured) between
    # default and highest.  The kernels' dots are MXU passes too, so the
    # f32 tolerance is MXU-rounding-sized, not 1e-5-sized; the CPU
    # interpret-mode tests (tests/test_pallas.py) pin true-f32 parity.
    with jax.default_matmul_precision("highest"):
        ref_val = jax.jit(ref_out)(fcp, linp, x, sh, er)
        ref_g = jax.jit(jax.grad(loss_of(ref_out), argnums=(0, 1, 2, 3, 4)))(
            fcp, linp, x, sh, er)

    failures = []
    for cd, tol_f, tol_g in ((jnp.float32, 1.5e-2, 1.5e-2),
                             (jnp.bfloat16, 2e-2, 4e-2)):
        cdn = np.dtype(cd).name
        full = PallasFullConv(tpe, fcnet, compute_dtype=cd,
                              compute_dsh=True)

        def k_out(fcp_, lp_, x_, sh_, er_, full=full):
            return full(fcp_, lp_, x_, er_, sh_, win0, tfirst, tlast,
                        srcl, dstl, N, pre_scale=0.5)

        def k_ext(fcp_, lp_, x_, sh_, er_, full=full):
            return full.apply_grad2(fcp_, lp_, x_, er_, sh_, win0, tfirst,
                                    tlast, srcl, dstl, N, pre_scale=0.5)

        for name, fn in (("call", k_out), ("ext", k_ext)):
            val = jax.jit(fn)(fcp, linp, x, sh, er)
            e = _maxrel(val, ref_val)
            ok = e < tol_f
            print(f"{cdn:8s} {name}: fwd rel-linf {e:.3e} "
                  f"{'OK' if ok else 'FAIL'}")
            if not ok:
                failures.append((cdn, name, "fwd", e))
            g = jax.jit(jax.grad(loss_of(fn), argnums=(0, 1, 2, 3, 4)))(
                fcp, linp, x, sh, er)
            labels = ("d_fc", "d_lin", "d_x", "d_sh", "d_er")
            for lbl, a, b in zip(
                    labels,
                    (jax.tree_util.tree_leaves(t) for t in g),
                    (jax.tree_util.tree_leaves(t) for t in ref_g)):
                err = max(_maxrel(ai, bi) for ai, bi in zip(a, b))
                ok = err < tol_g
                print(f"{cdn:8s} {name}: {lbl} rel-linf {err:.3e} "
                      f"{'OK' if ok else 'FAIL'}")
                if not ok:
                    failures.append((cdn, name, lbl, err))

    if failures:
        print("PARITY FAILURES:", failures)
        sys.exit(1)
    print(f"CONV PARITY OK on {jax.default_backend()}")


if __name__ == "__main__":
    main()
