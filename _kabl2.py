"""Ablations of the v2 fwd kernel: locate reshape/scatter/scratch cost."""
import sys
import time

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from equivariant_nn_zoo_tpu.data import Batch, GraphBatch
    from equivariant_nn_zoo_tpu.models import get_config
    from equivariant_nn_zoo_tpu.utils import build
    from equivariant_nn_zoo_tpu.nn.message_passing import FactorizedConvolution
    from equivariant_nn_zoo_tpu.ops.pallas.fused_conv import PallasFullConv

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
    N, E = node_cap, edge_cap

    convs = {}
    def walk(m, path=""):
        if isinstance(m, FactorizedConvolution):
            convs[path] = m
        for name, ch in getattr(m, "_children", {}).items():
            walk(ch, path + "/" + name)
    walk(model)
    fc = convs["/layer3/conv"]
    base = fc.full_conv
    in_dim = sum(mi.mul * mi.ir.dim for mi in base.irreps_in)

    key = jax.random.PRNGKey(0)
    params = model.init(key)
    p3 = params["layer3"]["conv"]
    x = jax.random.normal(key, (N, in_dim), jnp.float32)
    sh = jax.random.normal(key, (E, base.J_dim), jnp.float32)
    er = jax.random.normal(key, (E, base.fc_dims[0]), jnp.float32)
    win0 = jnp.asarray(gb.data["_edge_tile_win"])
    tfirst = jnp.asarray(gb.data["_edge_tile_first"])
    tlast = jnp.asarray(gb.data["_edge_tile_last"])
    srcl = jnp.asarray(gb.data["_edge_src_local"])
    dstl = jnp.asarray(gb.data["_edge_dst_local"])
    fcp, linp = p3["fc"], p3["tp"]["linear"]

    import jax.experimental.pallas as pl

    class NoReshape(PallasFullConv):
        """w2d replaced by a cheap broadcast (keeps mid+weighted live)."""
        def _full_fwd_kernel(self):
            J, I, K, mul, T, W = (self.J_dim, self.I_dim, self.K_dim,
                                  self.mul, self.tile, self.window)
            P = len(self.paths)
            nW = len(self.fc_dims) - 1
            G = len(self._mix)
            cd = self.compute_dtype
            mix = self._mix

            def kernel(win0_ref, first_ref, last_ref, *args):
                (srcl_ref, dstl_ref, x_ref, shT_ref, er_ref) = args[:5]
                W_refs = args[5: 5 + nW]
                C2_ref = args[5 + nW]
                wsel_refs = args[6 + nW: 6 + nW + G]
                acc_ref = args[6 + nW + G]
                accw_ref = args[7 + nW + G]

                t = pl.program_id(0)
                w0 = pl.multiple_of(win0_ref[t], 8)
                xw = x_ref[pl.ds(w0, W), :].astype(cd)
                srcl_ = srcl_ref[...]
                dstl_ = dstl_ref[...]
                iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
                one_s = (iota == srcl_).astype(cd)
                one_d = (iota == dstl_).astype(cd)
                g_x = jax.lax.dot_general(
                    one_s, xw, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)
                xb = jnp.transpose(g_x).reshape(I, mul * T)
                _, w_edge = self._mlp_fwd(er_ref[...],
                                          [w[...] for w in W_refs])
                wt = jnp.transpose(w_edge).reshape(P, mul * T)
                _, weighted = self._tp_weighted(
                    xb, shT_ref[...].astype(cd), wt, C2_ref[...]
                )
                s = jnp.sum(weighted, axis=1, keepdims=True)[:1, :]  # [1,1]
                w2d = jnp.zeros((K * mul, T), cd) + s.astype(cd)
                contrib = jax.lax.dot_general(
                    w2d, one_d,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(t == 0)
                def _():
                    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

                @pl.when(first_ref[t] == 1)
                def _():
                    accw_ref[...] = contrib

                @pl.when(first_ref[t] == 0)
                def _():
                    accw_ref[...] = accw_ref[...] + contrib

                @pl.when(last_ref[t] == 1)
                def _():
                    accw = accw_ref[...].astype(cd)
                    outs = []
                    for g, mx in enumerate(mix):
                        k0, npg, d = mx["k0"], mx["n_paths"], mx["d"]
                        ws_g = wsel_refs[g][...]
                        for dd in range(d):
                            c0 = (k0 + dd * npg) * mul
                            outs.append(
                                jax.lax.dot_general(
                                    accw[c0: c0 + npg * mul, :], ws_g,
                                    dimension_numbers=(((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )
                            )
                    full = jnp.concatenate(outs, axis=1)
                    cur = acc_ref[pl.ds(w0, W), :]
                    acc_ref[pl.ds(w0, W), :] = cur + full.astype(acc_ref.dtype)

            return kernel

    class NoScatter(NoReshape):
        """also skip the scatter dot + scratch RMW."""
        def _full_fwd_kernel(self):
            J, I, K, mul, T, W = (self.J_dim, self.I_dim, self.K_dim,
                                  self.mul, self.tile, self.window)
            P = len(self.paths)
            nW = len(self.fc_dims) - 1
            G = len(self._mix)
            cd = self.compute_dtype
            mix = self._mix

            def kernel(win0_ref, first_ref, last_ref, *args):
                (srcl_ref, dstl_ref, x_ref, shT_ref, er_ref) = args[:5]
                W_refs = args[5: 5 + nW]
                C2_ref = args[5 + nW]
                wsel_refs = args[6 + nW: 6 + nW + G]
                acc_ref = args[6 + nW + G]
                accw_ref = args[7 + nW + G]

                t = pl.program_id(0)
                w0 = pl.multiple_of(win0_ref[t], 8)
                xw = x_ref[pl.ds(w0, W), :].astype(cd)
                srcl_ = srcl_ref[...]
                dstl_ = dstl_ref[...]
                iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
                one_s = (iota == srcl_).astype(cd)
                g_x = jax.lax.dot_general(
                    one_s, xw, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)
                xb = jnp.transpose(g_x).reshape(I, mul * T)
                _, w_edge = self._mlp_fwd(er_ref[...],
                                          [w[...] for w in W_refs])
                wt = jnp.transpose(w_edge).reshape(P, mul * T)
                _, weighted = self._tp_weighted(
                    xb, shT_ref[...].astype(cd), wt, C2_ref[...]
                )
                s = jnp.sum(weighted, axis=1, keepdims=True)[:1, :1]

                @pl.when(t == 0)
                def _():
                    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

                cur = acc_ref[pl.ds(w0, W), :1]
                acc_ref[pl.ds(w0, W), :1] = cur + s

            return kernel

    def timeit(k, label):
        def run(a, b, x, sh, er):
            return k(a, b, x, er, sh, win0, tfirst, tlast, srcl, dstl, N,
                     pre_scale=1.0 / 3.0).sum()
        f = jax.jit(run)
        o = f(fcp, linp, x, sh, er); jax.block_until_ready(o)
        n = 300
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(fcp, linp, x, sh, er)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:12s}: {dt*1e3:.3f} ms")

    timeit(base, "full-v2")
    timeit(NoReshape(fc.tp, fc.fc), "no-reshape")
    timeit(NoScatter(fc.tp, fc.fc), "no-scatter")


if __name__ == "__main__":
    main()
