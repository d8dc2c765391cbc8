"""Ablation variants of the PallasFullConv fwd kernel to locate time.
python _kabl.py  -> times: full, no-mix, no-mid, no-mlp"""
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
    srcl = jnp.asarray(gb.data["_edge_src_local"])
    dstl = jnp.asarray(gb.data["_edge_dst_local"])
    fcp, linp = p3["fc"], p3["tp"]["linear"]

    class NoMix(PallasFullConv):
        def _tp_mix(self, xb, shv, wt, C2v, wselTs):
            J, mul, T = self.J_dim, self.mul, self.tile
            cd = self.compute_dtype
            rows = []
            for j in range(J):
                srep = jnp.concatenate([shv[j: j + 1, :]] * mul, axis=1)
                rows.append(srep * xb)
            outer = jnp.concatenate(rows, axis=0)
            mid = jax.lax.dot_general(
                C2v.astype(cd), outer,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)
            reps = -(-self.out_rows // self.K_dim)
            fake = jnp.concatenate([mid[:, :T]] * reps, axis=0)[:self.out_rows]
            return mid, fake

    class NoMid(PallasFullConv):
        def _tp_mix(self, xb, shv, wt, C2v, wselTs):
            J, I, K, mul, T = (self.J_dim, self.I_dim, self.K_dim, self.mul,
                               self.tile)
            cd = self.compute_dtype
            rows = []
            for j in range(J):
                srep = jnp.concatenate([shv[j: j + 1, :]] * mul, axis=1)
                rows.append(srep * xb)
            outer = jnp.concatenate(rows, axis=0)
            reps = -(-K // (J * I))
            mid = jnp.concatenate([outer] * reps, axis=0)[:K]
            outs = []
            for g, mx in enumerate(self._mix):
                k0, npg, d = mx["k0"], mx["n_paths"], mx["d"]
                wp = wt[self._w_path_slice(g)]
                for dd in range(d):
                    blk = mid[k0 + dd * npg: k0 + (dd + 1) * npg, :] * wp
                    blk = blk.reshape(npg * mul, T)
                    outs.append(
                        jax.lax.dot_general(
                            wselTs[g], blk,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(cd)
                    )
            return mid, jnp.concatenate(outs, axis=0)

    class NoMLP(PallasFullConv):
        def _mlp_fwd(self, erv, Wvals):
            cd = self.compute_dtype
            T = self.tile
            P = len(self.paths)
            mul = self.mul
            s = jnp.sum(Wvals[-1]) * 0 + jnp.sum(erv[:, :1])
            w = jnp.zeros((T, P * mul), cd) + s.astype(cd)
            return [], w

    class NoOuter(PallasFullConv):
        def _tp_mix(self, xb, shv, wt, C2v, wselTs):
            J, I, K, mul, T = (self.J_dim, self.I_dim, self.K_dim, self.mul,
                               self.tile)
            cd = self.compute_dtype
            outer = (
                jnp.concatenate([xb] * J, axis=0)
                + jnp.concatenate([shv[:1, :]] * (J * I), axis=0)[:, :1]
            )
            mid = jax.lax.dot_general(
                C2v.astype(cd), outer,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)
            outs = []
            for g, mx in enumerate(self._mix):
                k0, npg, d = mx["k0"], mx["n_paths"], mx["d"]
                wp = wt[self._w_path_slice(g)]
                for dd in range(d):
                    blk = mid[k0 + dd * npg: k0 + (dd + 1) * npg, :] * wp
                    blk = blk.reshape(npg * mul, T)
                    outs.append(
                        jax.lax.dot_general(
                            wselTs[g], blk,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(cd)
                    )
            return mid, jnp.concatenate(outs, axis=0)

    def timeit(k, label):
        def run(a, b, x, sh, er):
            return k(a, b, x, er, sh, win0, srcl, dstl, N,
                     pre_scale=1.0 / 3.0).sum()
        f = jax.jit(run)
        o = f(fcp, linp, x, sh, er); jax.block_until_ready(o)
        n = 300
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(fcp, linp, x, sh, er)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:10s}: {dt*1e3:.3f} ms")

    timeit(base, "full")
    timeit(NoMix(fc.tp, fc.fc), "no-mix")
    timeit(NoMid(fc.tp, fc.fc), "no-mid")
    timeit(NoMLP(fc.tp, fc.fc), "no-mlp")
    timeit(NoOuter(fc.tp, fc.fc), "no-outer")


if __name__ == "__main__":
    main()
