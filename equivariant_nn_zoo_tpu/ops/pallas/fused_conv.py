"""Pallas fused uvu-TP convolution: gather-side TP + weights + mix in VMEM.

The pure-XLA fused path (``ops/fused_tp.py``) is bounded by ~8 HBM passes
over the ``[E, K≈212, mul=64]`` tensor-product intermediate per layer
(forward and backward): the batched matmul writes it, the weight multiply
rewrites it, the mix dots read it, and the backward repeats each pass
(~17 GB/step at config_energy scale — the measured wall behind the round-1
813 graphs/sec plateau).  This kernel computes the intermediate tile-wise in
VMEM and never materializes it in HBM.

Reference hot loop being replaced: e3_layers/nn/message_passing.py:104-109
(one small einsum per CG path + per-edge mix).  Here the whole TP becomes
ONE MXU matmul per edge tile:

    minor layout (u, e): each tile holds TILE edges in lanes with the
    multiplicity u as the major half of the minor axis.

    outer[(j,i), (u,e)] = sh[j,e] * x[i,(u,e)]         (VPU, 9 broadcasts)
    mid[k, (u,e)]       = C2[k,(j,i)] @ outer           (one [K,JI]x[JI,u*T]
                                                         MXU matmul; C2 is
                                                         the static CG
                                                         operator, all paths)
    weighted            = mid * w_radial (per-path row broadcast, VPU)
    W3[(k,u), e]        = reshape(weighted)             (one relayout)
    out[(g,dd,io,w), e] = wselT_g @ W3-block            (per-(group,m3)
                                                         MXU matmuls = the
                                                         expansion's mix
                                                         linear, per edge)

Per-tile HBM traffic is just the gathered features, sh, radial weights and
the mixed edge output — the [E,K,mul] intermediate never leaves VMEM.

The custom VJP runs a sibling kernel that recomputes the forward
intermediates tile-wise (rematerialization: FLOPs are cheap on the MXU, HBM
is not) and emits cotangents for the gathered features, the spherical
harmonics, the radial weights and the mix matrices.  Second-order autodiff
(force training) is NOT supported through the custom VJP — callers that
differentiate through the output (GradientOutput) must use the XLA path.

K-order note: rows of the mid tensor are ordered (group, m3-component dd,
path m) — dd-major, unlike ``FusedUVUConv``'s (path, dd) — so that the mix
contraction over (m, u) sees a contiguous [n_paths*mul, TILE] block after
the single reshape.
"""

from __future__ import annotations

import functools
import os
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..fused_tp import FusedUVUConv


def pallas_supported() -> bool:
    """True when jax.experimental.pallas imports and a TPU or interpretable
    backend is available."""
    try:
        from jax.experimental import pallas as pl  # noqa: F401

        return True
    except Exception:
        return False


def _compiler_params(interpret: bool):
    """Raise the scoped-VMEM ceiling: the bwd kernel's working set (remat
    intermediates + grads) slightly exceeds Mosaic's 16MB default."""
    if interpret:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    )


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile_batch_env() -> int:
    """Edge tiles per grid step for the headline fwd/bwd kernels
    (E3_PALLAS_TILEBATCH, default 1).  Read at trace time so ablations can
    toggle it per run; the loader rounds edge capacities to tile*batch so
    the batched grid divides evenly (dataloader._auto_capacities)."""
    import os

    try:
        return max(1, int(os.environ.get("E3_PALLAS_TILEBATCH", "1")))
    except ValueError:
        return 1


class PallasUVUConv(FusedUVUConv):
    """Drop-in replacement for FusedUVUConv running the hot loop in Pallas.

    Parameter-compatible with ``TensorProductExpansion`` (same pytree as the
    XLA fused path); forward/backward parity is covered by tests.
    """

    def __init__(self, tpe, compute_dtype=jnp.bfloat16, tile: int = None):
        super().__init__(tpe, compute_dtype=compute_dtype)
        mul = self.mul
        if tile is None:
            # Mosaic requires the last block dim divisible by 128; the sh
            # and output blocks have bare edge tiles in lanes, so the edge
            # tile itself must be 128 (smaller tiles only work in interpret
            # mode, which tests use via an explicit tile=).
            tile = 128
        self.tile = tile
        self.J_dim = sum(mi.ir.dim for mi in self.irreps_sh)
        J, I, K, mul = self.J_dim, self.I_dim, self.K_dim, self.mul

        # ---- path/row bookkeeping in kernel K-order: (group, dd, m) -------
        # self.groups: (ir, k0, n_paths, d, p0); k0 values are unchanged
        # because each group's row count n_paths*d is order-independent.
        mid_irreps = tpe.tp.irreps_out
        i_starts = np.cumsum([0] + [mi.ir.dim for mi in self.irreps_in])
        j_starts = np.cumsum([0] + [mi.ir.dim for mi in self.irreps_sh])
        from ..wigner import wigner_3j

        C2 = np.zeros((K, J * I), np.float32)
        for g, (ir, k0, n_paths, d, p0) in enumerate(self.groups):
            for m in range(n_paths):
                ins = self.paths[p0 + m]
                l1 = self.irreps_in[ins.i_in1].ir.l
                l2 = self.irreps_sh[ins.i_in2].ir.l
                l3 = mid_irreps[ins.i_out].ir.l
                cg = wigner_3j(l1, l2, l3) * ins.path_weight  # [d1, d2, d3]
                i0 = int(i_starts[ins.i_in1])
                j0 = int(j_starts[ins.i_in2])
                for dd in range(d):
                    row = k0 + dd * n_paths + m
                    for m2 in range(2 * l2 + 1):
                        for m1 in range(2 * l1 + 1):
                            C2[row, (j0 + m2) * I + (i0 + m1)] += cg[m1, m2, dd]
        self._C2 = jnp.asarray(C2)

        # radial-weight rows (TPE layout) in our path order, per group slice
        self._w_order = np.asarray(
            [off // mul for off in self.path_w_offset], np.int32
        )

        # mix bookkeeping: per group the (k0, n_paths, d), the stacked wselT
        # column layout, and where each (dd, io) block lands in the output
        self._mix = []
        out_row = 0
        # final column permutation: final col (io, u, dd) <- kernel row
        out_dim = sum(mo.mul * mo.ir.dim for mo in self.linear.irreps_out)
        io_offsets = np.cumsum(
            [0] + [mo.mul * mo.ir.dim for mo in self.linear.irreps_out]
        )
        col_src = np.full(out_dim, -1, np.int64)
        for g, (ir, k0, n_paths, d, p0) in enumerate(self.groups):
            ios = self.lin_out.get(ir, [])
            muls = [self.linear.irreps_out[io].mul for io in ios]
            Wg = sum(muls)
            for dd in range(d):
                w_ofs = 0
                for io, mo_mul in zip(ios, muls):
                    # kernel rows out_row+dd*Wg+w_ofs .. +mo_mul are
                    # (io, u=0..mo_mul-1) at component dd
                    base = out_row + dd * Wg + w_ofs
                    for u in range(mo_mul):
                        col_src[io_offsets[io] + u * d + dd] = base + u
                    w_ofs += mo_mul
            self._mix.append(
                dict(k0=k0, n_paths=n_paths, d=d, ios=ios, muls=muls,
                     Wg=Wg, out_row=out_row)
            )
            out_row += d * Wg
        self.out_rows = out_row
        self.out_dim = out_dim
        # -1 (never produced) -> index out_rows, a zero pad row
        col_src[col_src < 0] = out_row
        self._col_src = jnp.asarray(col_src)

    # ------------------------------------------------------------------ XLA
    def _prep_x(self, x, edge_src, E):
        """x [N, in_dim] -> tiled-gathered [I, (E//T)*T*mul] with per-tile
        minor layout (u, e_local)."""
        mul, I, T = self.mul, self.I_dim, self.tile
        cd = self.compute_dtype
        blocks = []
        ofs = 0
        for mi in self.irreps_in:
            d = mi.ir.dim
            b = x[:, ofs: ofs + mul * d].reshape(-1, mul, d)
            blocks.append(jnp.transpose(b, (2, 1, 0)))  # [d, mul, N]
            ofs += mul * d
        xT = jnp.concatenate(blocks, axis=0).astype(cd)  # [I, mul, N]
        xg = jnp.take(xT, edge_src, axis=2)  # [I, mul, E]
        xg = xg.reshape(I, mul, E // T, T).transpose(0, 2, 1, 3)
        return xg.reshape(I, E * mul)

    def _prep_w(self, weight, E):
        """radial weights [E, P*mul] -> [P, (E//T)*T*mul], rows in our path
        order, per-tile minor (u, e_local)."""
        mul, T = self.mul, self.tile
        P = len(self.paths)
        cd = self.compute_dtype
        w = weight.reshape(E, P, mul)[:, self._w_order, :]
        w = w.transpose(1, 2, 0).reshape(P, mul, E // T, T)
        return w.transpose(0, 2, 1, 3).reshape(P, E * mul).astype(cd)

    def _prep_wsel(self, linear_params):
        """Per-group stacked mix matrices: wselT_g [Wg, n_paths*mul] (fwd)
        and wsel_g [n_paths*mul, Wg] (bwd), built from the TPE linear params
        so XLA autodiff routes the mix gradient back to the pytree."""
        cd = self.compute_dtype
        wselT, wsel = [], []
        for g, mx in enumerate(self._mix):
            ir = self.groups[g][0]
            ii = self.lin_in_index[ir]
            rows = self.group_row_perm[g]
            cols = []
            for io in mx["ios"]:
                w_full = linear_params[f"w{ii}_{io}"] * self.linear.alphas[io]
                cols.append(w_full[rows])  # [n_paths*mul, mul_out]
            w_g = jnp.concatenate(cols, axis=1).astype(cd)
            wsel.append(w_g)
            wselT.append(w_g.T)
        return wselT, wsel

    # --------------------------------------------------------------- kernels
    def _fwd_kernel(self):
        J, I, K, mul, T = self.J_dim, self.I_dim, self.K_dim, self.mul, self.tile
        mix, cd = self._mix, self.compute_dtype

        def kernel(xTT, shT, w2, C2, *args):
            wselT = args[: len(mix)]
            out = args[len(mix)]
            x = xTT[...]
            sh = shT[...]
            w = w2[...]
            # outer[(j,i), (u,e)] = sh[j,e] * x[i,(u,e)]
            rows = []
            for j in range(J):
                srep = jnp.concatenate([sh[j: j + 1, :]] * mul, axis=1)
                rows.append(srep * x)
            outer = jnp.concatenate(rows, axis=0)  # [J*I, mul*T]
            mid = jax.lax.dot_general(
                C2[...].astype(cd), outer,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)  # [K, mul*T]
            outs = []
            for g, mx in enumerate(mix):
                k0, npg, d = mx["k0"], mx["n_paths"], mx["d"]
                wp = w[self._w_path_slice(g)]  # [npg, mul*T]
                wt_g = wselT[g][...]
                for dd in range(d):
                    blk = mid[k0 + dd * npg: k0 + (dd + 1) * npg, :] * wp
                    blk = blk.reshape(npg * mul, T)
                    outs.append(
                        jax.lax.dot_general(
                            wt_g, blk,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(cd)
                    )
            out[...] = jnp.concatenate(outs, axis=0)

        return kernel

    def _w_path_slice(self, g):
        mx = self._mix[g]
        p0 = self.groups[g][4]
        return slice(p0, p0 + mx["n_paths"])

    def _bwd_kernel(self):
        J, I, K, mul, T = self.J_dim, self.I_dim, self.K_dim, self.mul, self.tile
        mix, cd = self._mix, self.compute_dtype
        G = len(mix)
        import jax.experimental.pallas as pl

        def kernel(*args):
            (xTT, shT, w2, C2, C2T) = args[:5]
            wsel = args[5: 5 + G]
            gout = args[5 + G]
            dx_ref, dsh_ref, dw_ref = args[6 + G: 9 + G]
            dwsel_refs = args[9 + G: 9 + 2 * G]

            x = xTT[...]
            sh = shT[...]
            w = w2[...]
            g_out = gout[...].astype(cd)

            # ---- recompute forward intermediates (remat) ------------------
            rows = []
            for j in range(J):
                srep = jnp.concatenate([sh[j: j + 1, :]] * mul, axis=1)
                rows.append(srep * x)
            outer = jnp.concatenate(rows, axis=0)
            mid = jax.lax.dot_general(
                C2[...].astype(cd), outer,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)

            # ---- mix backward + weight/mid cotangents ---------------------
            dmid_blocks = []
            dw_blocks = {}
            first_tile = pl.program_id(0) == 0
            for g, mx in enumerate(mix):
                k0, npg, d, Wg = mx["k0"], mx["n_paths"], mx["d"], mx["Wg"]
                wp = w[self._w_path_slice(g)]
                ws_g = wsel[g][...]
                dws_acc = None
                dw_acc = None
                for dd in range(d):
                    go_blk = g_out[
                        mx["out_row"] + dd * Wg: mx["out_row"] + (dd + 1) * Wg,
                        :,
                    ]
                    mid_blk = mid[k0 + dd * npg: k0 + (dd + 1) * npg, :]
                    w_blk = (mid_blk * wp).reshape(npg * mul, T)  # W3 block
                    # dwsel accumulation: W3_blk @ go_blk^T
                    contrib = jax.lax.dot_general(
                        w_blk, go_blk,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dws_acc = contrib if dws_acc is None else dws_acc + contrib
                    # dW3 = wsel @ gout
                    dW3 = jax.lax.dot_general(
                        ws_g, go_blk,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(cd).reshape(npg, mul * T)
                    dmid_blocks.append(dW3 * wp)
                    dwc = dW3 * mid_blk
                    dw_acc = dwc if dw_acc is None else dw_acc + dwc
                dw_blocks[g] = dw_acc

                @pl.when(first_tile)
                def _(g=g, dws_acc=dws_acc):
                    dwsel_refs[g][...] = dws_acc

                @pl.when(jnp.logical_not(first_tile))
                def _(g=g, dws_acc=dws_acc):
                    dwsel_refs[g][...] = dwsel_refs[g][...] + dws_acc

            dmid = jnp.concatenate(dmid_blocks, axis=0)  # [K, mul*T]
            # dw rows back to our path order
            dw_ref[...] = jnp.concatenate(
                [dw_blocks[g] for g in range(G)], axis=0
            ).astype(dw_ref.dtype)

            douter = jax.lax.dot_general(
                C2T[...].astype(cd), dmid,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)  # [J*I, mul*T]

            dx = None
            dsh_rows = []
            for j in range(J):
                srep = jnp.concatenate([sh[j: j + 1, :]] * mul, axis=1)
                do_j = douter[j * I: (j + 1) * I, :]
                contrib = srep * do_j
                dx = contrib if dx is None else dx + contrib
                # dsh[j, e] = sum_{i,u} douter[(j,i),(u,e)] * x[i,(u,e)]
                s = jnp.sum(do_j * x, axis=0)  # [mul*T]
                dsh_rows.append(jnp.sum(s.reshape(mul, T), axis=0,
                                        keepdims=True))
            dx_ref[...] = dx.astype(dx_ref.dtype)
            dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0).astype(
                dsh_ref.dtype
            )

        return kernel

    # ------------------------------------------------------------- pallas op
    @functools.cached_property
    def _pallas_fn(self):
        """custom_vjp'd function (xTT, shT, w2, wselT..., wsel...) -> outT."""
        import jax.experimental.pallas as pl

        J, I, K, mul, T = (self.J_dim, self.I_dim, self.K_dim, self.mul,
                           self.tile)
        G = len(self._mix)
        cd = self.compute_dtype
        C2 = self._C2
        C2T = jnp.asarray(np.ascontiguousarray(np.asarray(self._C2).T))
        out_rows = self.out_rows
        fwd_kernel = self._fwd_kernel()
        bwd_kernel = self._bwd_kernel()
        interpret = _use_interpret()

        def run_fwd(xTT, shT, w2, wselT):
            E = shT.shape[1]
            grid = (E // T,)
            in_specs = [
                pl.BlockSpec((I, T * mul), lambda t: (0, t)),
                pl.BlockSpec((J, T), lambda t: (0, t)),
                pl.BlockSpec((len(self.paths), T * mul), lambda t: (0, t)),
                pl.BlockSpec((K, J * I), lambda t: (0, 0)),
            ] + [
                pl.BlockSpec(w.shape, lambda t: (0, 0)) for w in wselT
            ]
            return pl.pallas_call(
                fwd_kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((out_rows, T), lambda t: (0, t)),
                out_shape=jax.ShapeDtypeStruct((out_rows, E), cd),
                interpret=interpret,
                **_compiler_params(interpret),
            )(xTT, shT, w2, C2, *wselT)

        def run_bwd(xTT, shT, w2, wsel, gout):
            E = shT.shape[1]
            grid = (E // T,)
            in_specs = [
                pl.BlockSpec((I, T * mul), lambda t: (0, t)),
                pl.BlockSpec((J, T), lambda t: (0, t)),
                pl.BlockSpec((len(self.paths), T * mul), lambda t: (0, t)),
                pl.BlockSpec((K, J * I), lambda t: (0, 0)),
                pl.BlockSpec((J * I, K), lambda t: (0, 0)),
            ] + [
                pl.BlockSpec(w.shape, lambda t: (0, 0)) for w in wsel
            ] + [
                pl.BlockSpec((out_rows, T), lambda t: (0, t)),
            ]
            out_shapes = [
                jax.ShapeDtypeStruct((I, E * mul), cd),      # dxTT
                jax.ShapeDtypeStruct((J, E), cd),            # dshT
                jax.ShapeDtypeStruct((len(self.paths), E * mul), cd),  # dw2
            ] + [
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wsel
            ]
            out_specs = [
                pl.BlockSpec((I, T * mul), lambda t: (0, t)),
                pl.BlockSpec((J, T), lambda t: (0, t)),
                pl.BlockSpec((len(self.paths), T * mul), lambda t: (0, t)),
            ] + [
                pl.BlockSpec(w.shape, lambda t: (0, 0)) for w in wsel
            ]
            return pl.pallas_call(
                bwd_kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=interpret,
                **_compiler_params(interpret),
            )(xTT, shT, w2, C2, C2T, *wsel, gout)

        @jax.custom_vjp
        def f(xTT, shT, w2, wselT, wsel):
            return run_fwd(xTT, shT, w2, wselT)

        def f_fwd(xTT, shT, w2, wselT, wsel):
            return run_fwd(xTT, shT, w2, wselT), (xTT, shT, w2, wsel)

        def f_bwd(res, gout):
            xTT, shT, w2, wsel = res
            outs = run_bwd(xTT, shT, w2, wsel, gout)
            dxTT, dshT, dw2 = outs[:3]
            dwsel = list(outs[3:])
            # the mix gradient is returned on the untransposed (wsel) leg;
            # the wselT leg gets zeros (both derive from the same params
            # upstream, XLA sums the two paths)
            dwselT = [jnp.zeros((w.shape[1], w.shape[0]), w.dtype)
                      for w in wsel]
            return (dxTT, dshT, dw2, dwselT,
                    [d.astype(w.dtype) for d, w in zip(dwsel, wsel)])

        f.defvjp(f_fwd, f_bwd)
        return f

    # ------------------------------------------------------------- interface
    def __call__(self, linear_params, x, edge_src, edge_dst, sh, weight,
                 num_nodes: int, pre_scale=None, out_dtype=jnp.float32,
                 reduce: bool = True):
        """Same contract as FusedUVUConv.__call__ (message_passing.py);
        ``reduce=False`` returns the per-edge mixed output (the Pairwise
        head's neighbor conv, reference e3_layers/nn/output.py:77-164)."""
        from ..segment import segment_sum

        cd = self.compute_dtype
        E = sh.shape[0]
        T = self.tile
        assert E % T == 0, f"edge capacity {E} not a multiple of tile {T}"

        xTT = self._prep_x(x, edge_src, E)
        shT = jnp.transpose(sh, (1, 0)).astype(cd)
        w2 = self._prep_w(weight, E)
        wselT, wsel = self._prep_wsel(linear_params)

        outT = self._pallas_fn(xTT, shT, w2, wselT, wsel)  # [out_rows, E]
        # pad one zero row for columns no path produces, then permute into
        # the irreps_out layout and flip to edge-major
        outT = jnp.concatenate(
            [outT, jnp.zeros((1, E), outT.dtype)], axis=0
        )
        edge_out = jnp.take(outT, self._col_src, axis=0).T  # [E, out_dim]
        if pre_scale is not None:
            edge_out = edge_out * pre_scale
        if not reduce:
            return edge_out.astype(out_dtype)
        edge_out = edge_out.astype(cd)
        out = segment_sum(edge_out, edge_dst, num_nodes)
        return out.astype(out_dtype)


class PallasFullConv(PallasUVUConv):
    """Whole-convolution kernel: windowed gather + radial MLP + TP + mix +
    windowed scatter, all in VMEM.

    v1 (PallasUVUConv) still paid for edge-major HBM tensors around the
    kernel: the gathered features [E, I*mul], the radial weights [E, P*mul]
    and the mixed edge output [E, out_rows] (~400MB/layer at QM9 scale).
    This variant keeps the node feature table and the node output
    accumulator RESIDENT in VMEM and converts gather/scatter into one-hot
    MXU matmuls over a per-tile node window:

        G[e,:]    = sum_w onehot_src[w,e] * x[win0+w, :]     (gather)
        acc[w,:] += sum_e onehot_dst[w,e] * out[e, :]        (scatter)

    which requires the batch invariant provided by
    ``GraphBatch.from_batch(..., edge_tile=T)``: every tile of T edges
    belongs to a single graph whose nodes fit a W-node window
    (``_edge_tile_win`` holds each tile's window start; ``_edge_src_local``
    / ``_edge_dst_local`` are window-relative; ``_edge_tile_first`` /
    ``_edge_tile_last`` mark run boundaries).  The radial MLP
    (FullyConnectedNet, nn/mlp.py) runs per tile on the MXU, so its
    [E, weight_numel] output never exists in HBM either.

    Mix placement (the key deviation from the per-edge docstring above):
    measured on v5e, 32 per-(group,component) mix dots per edge tile are
    ~10%-efficient (M=64, N=128) and dominated the kernel.  Instead the
    UNMIXED weighted TP (width K*mul) is scattered into a per-window VMEM
    accumulator — one clean MXU matmul per tile — and the mix dots run once
    per node window (the tiles of a "run" share one window, so the flush
    fires at each run's last tile; ~12x fewer mix dots at QM9 density).
    This is the in-VMEM analogue of the XLA path's mix-after-scatter trick.
    The single per-tile relayout [K, mul*T] -> [K*mul, T] splits the wide
    TP output to edge-minor rows; the radial-weight factor is assembled in
    that layout from 64-aligned row-block concats of the MLP output
    transpose (free register stacking).

    Per layer-direction HBM traffic: x (once), sh, edge_radial, the node
    output — ~45MB instead of ~1.2GB.
    """

    def __init__(self, tpe, fc, compute_dtype=jnp.bfloat16, tile: int = None,
                 window: int = 128, compute_dsh: bool = False,
                 sh0_const: bool = False):
        super().__init__(tpe, compute_dtype=compute_dtype, tile=tile)
        self.window = window
        # sh[:, 0] == 1 identically when sh is a real spherical-harmonic
        # encoding (Y00 under component normalization, pad edges included);
        # the l2=0 srep multiply and the j=0 dx accumulate then collapse to
        # plain copies/adds.  Callers feeding arbitrary "sh" data (parity
        # tests) must leave this False.  Only meaningful when the first sh
        # irrep actually is the scalar.
        self.sh0_const = bool(sh0_const) and self.irreps_sh[0].ir.l == 0
        # sh = SH(edge_vector) has no parameters, and every pallas-eligible
        # config treats positions as conditioning inputs (force heads build
        # their convolutions with pallas=False and take the XLA path), so
        # the sh cotangent is dead by construction — skip its VPU loop.
        # Set True to differentiate through sh (parity tests do).
        self.compute_dsh = compute_dsh
        self.fc = fc
        self.fc_dims = list(fc.dims)
        self.fc_act = fc.act
        mul = self.mul
        # last MLP layer columns in our path order: (p_ours, u) <- (p_tpe, u)
        self._wcol_perm = jnp.asarray(
            np.concatenate(
                [np.arange(p * mul, (p + 1) * mul) for p in self._w_order]
            )
        )
        self._tpe_mid_irreps = tpe.tp.irreps_out
        self._build_l2_split()

    def _build_l2_split(self):
        """Per-sh-irrep sectioned TP bookkeeping.

        Every K-row (a (group, component, path) triple) contracts exactly
        ONE sh irrep's block of `outer` ((2*l2+1)*I columns).  Sectioning
        the dense CG matmul per sh irrep (l2 = 0, 1, 2, ... for the
        NequIP configs) replaces one [K, J*I] contraction with S narrow
        ones [K_s, (2*l2+1)*I] — ~47%% fewer FLOPs and, because the
        adjoint's contraction dim shrinks from K to K_s, ~half the MXU
        passes on the two biggest matmuls (mid and its adjoint).  Cost:
        per-(group, section) bookkeeping for the mix/flush slicing.

        Section metadata (``self._secs``, ordered by sh row offset so the
        adjoint blocks concatenate straight into `douter`):
          jm0 / jdim — sh component rows covered ([jm0, jm0+jdim));
          K8 — 8-rounded row count of the section's C block;
          k0 — absolute row offset of the section inside the stacked
          [K2, mul*T] mid tensor."""

        mul = self.mul
        J, I = self.J_dim, self.I_dim
        from ..wigner import wigner_3j

        mid_irreps = self.tp_mid_irreps
        i_starts = np.cumsum([0] + [mi.ir.dim for mi in self.irreps_in])
        j_starts = np.cumsum([0] + [mi.ir.dim for mi in self.irreps_sh])

        def ceil8(x):
            return -(-x // 8) * 8

        G = len(self.groups)
        n_sh = len(self.irreps_sh)
        # per (sh-irrep, group): our-path indices using that sh irrep
        paths_sg = [[[] for _ in range(G)] for _ in range(n_sh)]
        for g, (ir, k0, n_paths, d, p0) in enumerate(self.groups):
            for m in range(n_paths):
                p = p0 + m
                paths_sg[self.paths[p].i_in2][g].append(p)
        active = [s for s in range(n_sh) if any(paths_sg[s])]

        # MLP column order: sections outer (by sh slot), groups inner
        self._p2 = [p for s in active for g in range(G)
                    for p in paths_sg[s][g]]
        self._wcol_perm2 = jnp.asarray(np.concatenate([
            np.arange(self.path_w_offset[p], self.path_w_offset[p] + mul)
            for p in self._p2
        ]))
        w_ofs = {}
        ofs = 0
        for s in active:
            for g in range(G):
                w_ofs[(g, s)] = ofs
                ofs += len(paths_sg[s][g])

        # section row layout: rows (g, dd, m) per section, pad8 per section
        self._secs = []
        k0_sg = {}
        k2 = 0
        for s in active:
            rows = sum(
                len(paths_sg[s][g]) * self.groups[g][3] for g in range(G)
            )
            K8 = max(8, ceil8(rows))
            ofs = k2
            for g in range(G):
                k0_sg[(g, s)] = ofs
                ofs += len(paths_sg[s][g]) * self.groups[g][3]
            self._secs.append(dict(
                sh=s, jm0=int(j_starts[s]),
                jdim=self.irreps_sh[s].ir.dim, rows=rows, K8=K8, k0=k2,
            ))
            k2 += K8
        self.K2 = k2

        Cs_np = []
        for sm in self._secs:
            s = sm["sh"]
            C = np.zeros((sm["K8"], sm["jdim"] * I), np.float32)
            for g, (ir, k0, n_paths, d, p0) in enumerate(self.groups):
                plist = paths_sg[s][g]
                npg = len(plist)
                base = k0_sg[(g, s)] - sm["k0"]
                for m, p in enumerate(plist):
                    ins = self.paths[p]
                    l1 = self.irreps_in[ins.i_in1].ir.l
                    l2 = self.irreps_sh[ins.i_in2].ir.l
                    l3 = mid_irreps[ins.i_out].ir.l
                    cg = wigner_3j(l1, l2, l3) * ins.path_weight
                    i0 = int(i_starts[ins.i_in1])
                    for dd in range(d):
                        row = base + dd * npg + m
                        for m2 in range(2 * l2 + 1):
                            for m1 in range(2 * l1 + 1):
                                C[row, m2 * I + i0 + m1] += cg[m1, m2, dd]
            Cs_np.append(C)

        # Pack consecutive sections into block-diagonal "super-section"
        # dots.  A single section's mid matmul [K8_s, jdim_s*I] @ outer is
        # padded to 128 on BOTH dims by the MXU (the l2=0 section is
        # 32x32 at I=32 — 6% occupancy); two (or three) consecutive
        # sections whose row and contraction sums still fit one 128 block
        # cost the SAME single MXU pass as either alone (e.g. the NequIP
        # l_max=2 convs: l2=0 [32,32] + l2=1 [80,96] pack to [112,128] —
        # an exact full-width contraction).  The adjoint packs the same
        # way with M/K swapped.  Sections must be jm-contiguous so the
        # packed outer slice / douter block stay single row ranges; the
        # K2 row layout is untouched (packs cover consecutive sections),
        # so the wt2 / dwin / dwsel / mix bookkeeping is unaffected.
        #
        # MEASURED AND REJECTED as the default (E3_PALLAS_SECPACK=1 to
        # enable): on real TPU the packed headline step is 1.4% SLOWER
        # (4449.0 +/- 0.2 vs 4510.5 +/- 1.8 g/s, 2x2 interleaved A/B,
        # /tmp/ab_secpack.log 2026-08-19) despite strictly fewer MXU
        # passes — same Mosaic-scheduling behavior class as the twice-
        # rejected fwd-saved-residual (see CLAUDE.md).  Kept functional
        # and parity-tested: the occupancy argument should win on configs
        # with many narrow sections (l_max>=3 heads).
        pack_on = os.environ.get("E3_PALLAS_SECPACK", "0") != "0"
        self._packs = []
        for si, sm in enumerate(self._secs):
            kdim = sm["jdim"] * I
            pk = self._packs[-1] if self._packs else None
            if (pack_on and pk is not None
                    and pk["K8"] + sm["K8"] <= 128
                    and pk["kdim"] + kdim <= 128
                    and pk["jm0"] + pk["jdim"] == sm["jm0"]):
                pk["sis"].append(si)
                pk["K8"] += sm["K8"]
                pk["kdim"] += kdim
                pk["jdim"] += sm["jdim"]
            else:
                self._packs.append(dict(
                    sis=[si], k0=sm["k0"], K8=sm["K8"], kdim=kdim,
                    jm0=sm["jm0"], jdim=sm["jdim"],
                ))
        self._C2s, self._C2Ts = [], []
        for pk in self._packs:
            C = np.zeros((pk["K8"], pk["kdim"]), np.float32)
            r0 = c0 = 0
            for si in pk["sis"]:
                Cs = Cs_np[si]
                C[r0: r0 + Cs.shape[0], c0: c0 + Cs.shape[1]] = Cs
                r0 += Cs.shape[0]
                c0 += Cs.shape[1]
            self._C2s.append(jnp.asarray(C))
            self._C2Ts.append(jnp.asarray(np.ascontiguousarray(C.T)))

        # per-group sections for the mix/flush slicing, and wsel row perms
        self._mix2 = []
        sec_idx = 0
        for g, mx in enumerate(self._mix):
            secs = []
            base_perm = np.asarray(self.group_row_perm[g])
            p0 = self.groups[g][4]
            for si, sm in enumerate(self._secs):
                plist = paths_sg[sm["sh"]][g]
                if not plist:
                    continue
                perm = np.concatenate([
                    base_perm[(p - p0) * mul: (p - p0 + 1) * mul]
                    for p in plist
                ])
                secs.append(dict(
                    k0=k0_sg[(g, sm["sh"])], npg=len(plist),
                    wofs=w_ofs[(g, sm["sh"])], si=si,
                    perm=jnp.asarray(perm), idx=sec_idx,
                ))
                sec_idx += 1
            self._mix2.append(dict(
                d=mx["d"], Wg=mx["Wg"], out_row=mx["out_row"],
                ios=mx["ios"], muls=mx["muls"], secs=secs,
            ))
        self.n_secs = sec_idx

    @property
    def tp_mid_irreps(self):
        return self._tpe_mid_irreps

    def _prep_wsel2(self, linear_params):
        """Per-(group, section) mix matrices [npg*mul, Wg] in kernel order;
        gradients flow back to the TPE linear params through this gather."""
        cd = self.compute_dtype
        out = []
        for g, mx in enumerate(self._mix2):
            ir = self.groups[g][0]
            ii = self.lin_in_index[ir]
            for sec in mx["secs"]:
                cols = []
                for io in mx["ios"]:
                    w_full = (linear_params[f"w{ii}_{io}"]
                              * self.linear.alphas[io])
                    cols.append(w_full[sec["perm"]])
                out.append(jnp.concatenate(cols, axis=1).astype(cd))
        return out

    # ---------------------------------------------------------- shared math
    def _tp_mix(self, xb, sh, wt, C2v, wselTs):
        """xb [I, mul*T], sh [J, T], wt [P, mul*T] -> (mid, outs [out_rows, T])."""
        J, I, K, mul, T = (self.J_dim, self.I_dim, self.K_dim, self.mul,
                           self.tile)
        cd = self.compute_dtype
        rows = []
        for j in range(J):
            srep = jnp.concatenate([sh[j: j + 1, :]] * mul, axis=1)
            rows.append(srep * xb)
        outer = jnp.concatenate(rows, axis=0)
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

    def _mlp_fwd(self, er, Wvals):
        """er [T, nb] -> (pre-activations list, w_edge [T, P*mul])."""
        cd = self.compute_dtype
        h = er.astype(cd)
        pre = []
        n = len(Wvals)
        for i, Wm in enumerate(Wvals):
            h = jax.lax.dot_general(
                h, Wm.astype(cd),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pre.append(h)
            if i < n - 1:
                h = self.fc_act(h).astype(cd)
        return pre, h.astype(cd)

    # -------------------------------------------------------------- kernels
    def _tp_mid2(self, xb, sh, wT2, C2vs, sh0c=None):
        """xb [I, mul*T], sh [J, T], wT2 [P*mul, T] (rows in _p2 order) ->
        (mid2, wt2, w2d), all [K2*mul, T] with rows (section, k, u).

        The TP intermediate leaves the MXU in the wide (u, e)-minor layout
        via one narrow matmul per sh-irrep section (see _build_l2_split);
        one relayout per section splits it to edge-minor rows, and the
        radial-weight factor is assembled purely from 64-aligned row-block
        concats of the MLP output transpose (free register stacking).

        ``sh0c`` overrides ``self.sh0_const`` — the second-order kernels
        substitute cotangents into the sh slot, where row 0 is NOT 1."""
        if sh0c is None:
            sh0c = self.sh0_const
        mid2 = self._mid2_of(xb, sh, C2vs, sh0c)
        wt2 = self._wt2_of(wT2)
        return mid2, wt2, mid2 * wt2

    def _mid2_of(self, xb, sh, C2vs, sh0c):
        """The (x, sh)-dependent TP intermediate: [K2*mul, T] section rows.

        One block-diagonal dot per section PACK (see _build_l2_split); the
        packed [K8, mul*T] -> [K8*mul, T] reshape equals the per-section
        reshapes concatenated because packs cover consecutive K2 rows."""
        J, I, mul, T = self.J_dim, self.I_dim, self.mul, self.tile
        cd = self.compute_dtype
        rows = []
        for j in range(J):
            if j == 0 and sh0c:
                rows.append(xb)
                continue
            srep = jnp.concatenate([sh[j: j + 1, :]] * mul, axis=1)
            rows.append(srep * xb)
        mids = []
        for pi, pk in enumerate(self._packs):
            outer_p = (
                rows[pk["jm0"]] if pk["jdim"] == 1 else jnp.concatenate(
                    rows[pk["jm0"]: pk["jm0"] + pk["jdim"]], axis=0
                )
            )                                              # [jdim*I, mul*T]
            mid_p = jax.lax.dot_general(
                C2vs[pi].astype(cd), outer_p,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)                                   # [K8, mul*T]
            mids.append(mid_p.reshape(pk["K8"] * mul, T))
        return jnp.concatenate(mids, axis=0)

    def _douter_of(self, dmid2, C2Tvals):
        """CG adjoint of _mid2_of: [K2*mul, T] -> [J*I, mul*T] wide rows.

        One packed C^T dot per section pack; sh rows with no paths get
        zero blocks so the caller can slice per-j unconditionally."""
        J, I, mul, T = self.J_dim, self.I_dim, self.mul, self.tile
        cd = self.compute_dtype
        dblocks = []
        jm_done = 0
        for pi, pk in enumerate(self._packs):
            if pk["jm0"] > jm_done:
                dblocks.append(jnp.zeros(
                    ((pk["jm0"] - jm_done) * I, mul * T), cd
                ))
            dmid_p = dmid2[
                pk["k0"] * mul: (pk["k0"] + pk["K8"]) * mul, :
            ].reshape(pk["K8"], mul * T)
            dblocks.append(jax.lax.dot_general(
                C2Tvals[pi].astype(cd), dmid_p,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd))                                  # [jdim*I, mul*T]
            jm_done = pk["jm0"] + pk["jdim"]
        if jm_done < J:
            dblocks.append(jnp.zeros(((J - jm_done) * I, mul * T), cd))
        return jnp.concatenate(dblocks, axis=0)

    def _wt2_of(self, wT2):
        """Radial-weight rows matching the (section, g, dd, m, u) order."""
        mul, T = self.mul, self.tile
        cd = self.compute_dtype
        parts = []
        for si, sm in enumerate(self._secs):
            used = 0
            for g, mx in enumerate(self._mix2):
                d = mx["d"]
                for sec in mx["secs"]:
                    if sec["si"] != si:
                        continue
                    blk = wT2[sec["wofs"] * mul:
                              (sec["wofs"] + sec["npg"]) * mul, :]
                    parts.extend([blk] * d)
                    used += sec["npg"] * d
            if sm["K8"] - used:
                parts.append(jnp.zeros(((sm["K8"] - used) * mul, T), cd))
        return jnp.concatenate(parts, axis=0)              # [K2*mul, T]

    def _full_fwd_kernel(self, B: int = 1, save_mid: bool = False):
        """``B``: edge tiles per grid step (E3_PALLAS_TILEBATCH).  The
        per-tile chain alternates VPU (outer build, weight mult) and MXU
        (TP, scatter) stages with data dependencies, so with one tile per
        grid step the units idle alternately; batching B independent tiles
        into one kernel body lets Mosaic overlap tile b's VPU stages with
        tile b+1's MXU dots.  Semantics are identical: sub-tiles run in
        program order, so run-boundary accumulator resets stay correct.

        ``save_mid``: additionally stream the per-tile TP intermediate
        ``mid2`` [K2*mul, T] to a second output so the backward pass can
        skip the gather + outer build + fwd CG dots (E3_PALLAS_SAVEMID;
        B == 1 only — sub-tile stores at value-level lane offsets do not
        legalize, see the load note below)."""
        import jax.experimental.pallas as pl

        assert not (save_mid and B != 1)

        J, I, mul, T, W = (self.J_dim, self.I_dim, self.mul, self.tile,
                           self.window)
        nW = len(self.fc_dims) - 1
        S = self.n_secs
        cd = self.compute_dtype
        mix2 = self._mix2

        nC2 = len(self._C2s)

        def kernel(win0_ref, first_ref, last_ref, *args):
            (srcl_ref, dstl_ref, x_ref, shT_ref, er_ref) = args[:5]
            W_refs = args[5: 5 + nW]
            C2_refs = args[5 + nW: 5 + nW + nC2]
            wsel_refs = args[5 + nW + nC2: 5 + nW + nC2 + S]
            acc_ref = args[5 + nW + nC2 + S]
            n_out = 6 + nW + nC2 + S
            mid_ref = args[n_out] if save_mid else None
            accw_ref = args[n_out + (1 if save_mid else 0)]  # [K2*mul, W]

            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

            # per-sub-tile operands are loaded straight from the refs with
            # static tile-aligned slices: a value-level slice of the whole
            # [*, B*T] load keeps an in-register lane offset (b*T) that
            # Mosaic cannot legalize through vector.broadcast ("Invalid
            # input layout" at B>1); a ref load at a 128-multiple offset
            # lands at lane offset 0.
            Wvals = [w[...] for w in W_refs]
            C2vals = [c[...] for c in C2_refs]
            for b in range(B):
                ti = t * B + b
                w0 = pl.multiple_of(win0_ref[ti], 8)
                xw = x_ref[pl.ds(w0, W), :].astype(cd)   # [W, I*mul]
                srcl = srcl_ref[:, b * T: (b + 1) * T]
                dstl = dstl_ref[:, b * T: (b + 1) * T]
                iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
                one_s = (iota == srcl).astype(cd)
                one_d = (iota == dstl).astype(cd)
                g_x = jax.lax.dot_general(
                    one_s, xw,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)                              # [T, I*mul]
                xb = jnp.transpose(g_x).reshape(I, mul * T)
                _, w_edge = self._mlp_fwd(
                    er_ref[b * T: (b + 1) * T, :], Wvals
                )
                wT2 = jnp.transpose(w_edge)               # [P*mul, T]
                mid2, _, w2d = self._tp_mid2(
                    xb, shT_ref[:, b * T: (b + 1) * T].astype(cd),
                    wT2, C2vals,
                )
                if save_mid:
                    mid_ref[...] = mid2.astype(mid_ref.dtype)
                # scatter the UNMIXED weighted TP into the window
                # accumulator: one MXU-shaped matmul (M = K2*mul) instead
                # of 32 mix-width ones — the mix runs once per window at
                # the run's last tile.  f32 per-run accumulation: every
                # tile's contribution sums in full precision; a single
                # rounding to compute dtype happens at the flush (the
                # bf16-accumulate drift concern of multi-tile runs is gone)
                contrib = jax.lax.dot_general(
                    w2d, one_d,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                         # [K2*mul, W] f32

                @pl.when(first_ref[ti] == 1)
                def _(contrib=contrib):
                    accw_ref[...] = contrib

                @pl.when(first_ref[ti] == 0)
                def _(contrib=contrib):
                    accw_ref[...] = accw_ref[...] + contrib

                @pl.when(last_ref[ti] == 1)
                def _(w0=w0):
                    accw = accw_ref[...].astype(cd)
                    outs = []
                    for g, mx in enumerate(mix2):
                        d = mx["d"]
                        for dd in range(d):
                            blk = None
                            for sec in mx["secs"]:
                                c0 = (sec["k0"] + dd * sec["npg"]) * mul
                                dsec = jax.lax.dot_general(
                                    accw[c0: c0 + sec["npg"] * mul, :],
                                    wsel_refs[sec["idx"]][...],
                                    dimension_numbers=(
                                        ((0,), (0,)), ((), ())
                                    ),
                                    preferred_element_type=jnp.float32,
                                )                         # [W, Wg]
                                blk = dsec if blk is None else blk + dsec
                            outs.append(blk)
                    full = jnp.concatenate(outs, axis=1)  # [W, out_rows]
                    cur = acc_ref[pl.ds(w0, W), :]
                    acc_ref[pl.ds(w0, W), :] = (
                        cur + full.astype(acc_ref.dtype)
                    )

        return kernel

    def _full_bwd_kernel(self, B: int = 1, load_mid: bool = False):
        """``B``: edge tiles per grid step — see _full_fwd_kernel.  The
        radial-MLP weight gradients accumulate in registers across the B
        sub-tiles (one ref add per grid step) so the sub-tile chains stay
        independent except for the per-run accumulator scratches.

        ``load_mid`` (E3_PALLAS_SAVEMID): the forward streamed the TP
        intermediate ``mid2`` per tile; load it instead of recomputing —
        drops the x gather (whole-table VMEM residency included, unless
        ``compute_dsh`` still needs xb), the J-row outer build (the
        biggest VPU block) and the fwd-direction CG pack dots (C2s are
        not even passed in).  wt2 still comes from the in-kernel MLP
        recompute, whose pre-activations the MLP backward needs anyway."""
        import jax.experimental.pallas as pl

        assert not (load_mid and B != 1)

        J, I, mul, T, W = (self.J_dim, self.I_dim, self.mul, self.tile,
                           self.window)
        nW = len(self.fc_dims) - 1
        S = self.n_secs
        cd = self.compute_dtype
        mix2 = self._mix2
        nSec = len(self._secs)
        nC2 = len(self._C2s)
        secs_meta = self._secs

        has_x = (not load_mid) or self.compute_dsh

        def kernel(win0_ref, first_ref, last_ref, *args):
            it = iter(args)
            srcl_ref = next(it)
            dstl_ref = next(it)
            x_ref = next(it) if has_x else None
            shT_ref = next(it)
            er_ref = next(it)
            mid_in_ref = next(it) if load_mid else None
            W_refs = [next(it) for _ in range(nW)]
            C2_refs = [] if load_mid else [next(it) for _ in range(nC2)]
            C2T_refs = [next(it) for _ in range(nC2)]
            wsel_refs = [next(it) for _ in range(S)]
            gout_ref = next(it)
            dx_ref = next(it)
            dsh_ref = next(it)
            der_ref = next(it)
            dW_refs = [next(it) for _ in range(nW)]
            dwsel_refs = [next(it) for _ in range(S)]
            dwin_ref = next(it)
            accw_ref = next(it)                            # scratch

            t = pl.program_id(0)

            @pl.when(t == 0)
            def _():
                dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)
                for i in range(nW):
                    dW_refs[i][...] = jnp.zeros(
                        dW_refs[i].shape, dW_refs[i].dtype
                    )
                for s in range(S):
                    dwsel_refs[s][...] = jnp.zeros(
                        dwsel_refs[s].shape, dwsel_refs[s].dtype
                    )

            # sub-tile operands load from the refs at 128-multiple offsets
            # (see _full_fwd_kernel: value-level lane-offset slices do not
            # legalize at B>1)
            Wvals = [w[...] for w in W_refs]
            C2vals = [c[...] for c in C2_refs]
            dW_loc = [None] * nW
            dsh_parts = []
            der_parts = []
            for b in range(B):
                ti = t * B + b
                w0 = pl.multiple_of(win0_ref[ti], 8)

                # per-window upstream cotangent of the UNMIXED accumulator:
                # dwin[(k,u), w] = sum_{io,u'} wsel gout[w0+w, ...] —
                # computed once per run (the mix weights are per-window
                # constants).  Blocks are emitted in scratch row order: per
                # section, its groups' blocks then a zero pad to that
                # section's K8.
                @pl.when(first_ref[ti] == 1)
                def _(w0=w0):
                    gw = gout_ref[pl.ds(w0, W), :].astype(cd)
                    blocks = []
                    for si, sm in enumerate(secs_meta):
                        used = 0
                        for g, mx in enumerate(mix2):
                            Wg, d = mx["Wg"], mx["d"]
                            for sec in mx["secs"]:
                                if sec["si"] != si:
                                    continue
                                ws_g = wsel_refs[sec["idx"]][...]
                                for dd in range(d):
                                    r0 = mx["out_row"] + dd * Wg
                                    blocks.append(
                                        jax.lax.dot_general(
                                            ws_g, gw[:, r0: r0 + Wg],
                                            dimension_numbers=(
                                                ((1,), (1,)), ((), ())
                                            ),
                                            preferred_element_type=(
                                                jnp.float32
                                            ),
                                        )
                                    )                      # [npg*mul, W]
                                used += sec["npg"] * d
                        if sm["K8"] - used:
                            blocks.append(
                                jnp.zeros(((sm["K8"] - used) * mul, W),
                                          jnp.float32)
                            )
                    dwin_ref[...] = jnp.concatenate(blocks, axis=0).astype(
                        dwin_ref.dtype
                    )
                    accw_ref[...] = jnp.zeros(accw_ref.shape,
                                              accw_ref.dtype)

                srcl = srcl_ref[:, b * T: (b + 1) * T]
                dstl = dstl_ref[:, b * T: (b + 1) * T]
                iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
                one_s = (iota == srcl).astype(cd)
                one_d = (iota == dstl).astype(cd)
                if has_x:
                    xw = x_ref[pl.ds(w0, W), :].astype(cd)
                    g_x = jax.lax.dot_general(
                        one_s, xw,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(cd)
                    xb = jnp.transpose(g_x).reshape(I, mul * T)
                else:
                    xb = None
                sh = shT_ref[:, b * T: (b + 1) * T].astype(cd)
                er = er_ref[b * T: (b + 1) * T, :]
                pre, w_edge = self._mlp_fwd(er, Wvals)
                wT2 = jnp.transpose(w_edge)                # [P*mul, T]

                if load_mid:
                    # forward intermediates streamed from the fwd kernel
                    mid2 = mid_in_ref[...].astype(cd)
                    wt2 = self._wt2_of(wT2)
                    w2d = mid2 * wt2
                else:
                    # recompute forward intermediates (remat)
                    mid2, wt2, w2d = self._tp_mid2(xb, sh, wT2, C2vals)
                contrib = jax.lax.dot_general(
                    w2d, one_d,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # [K2*mul, W] f32
                accw_ref[...] = accw_ref[...] + contrib

                # per-edge cotangent of the weighted TP, via the window
                # gather
                dw2d = jax.lax.dot_general(
                    dwin_ref[...], one_d,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)                               # [K2*mul, T]

                # radial-weight cotangent: rows (k,u) -> sum components per
                # path, emitted in _p2 (sections outer, groups inner) order
                dwp2 = dw2d * mid2
                dwt_blocks = []
                for si in range(nSec):
                    for g, mx in enumerate(mix2):
                        d = mx["d"]
                        for sec in mx["secs"]:
                            if sec["si"] != si:
                                continue
                            dw_acc = None
                            for dd in range(d):
                                r0 = (sec["k0"] + dd * sec["npg"]) * mul
                                blk = dwp2[r0: r0 + sec["npg"] * mul, :]
                                dw_acc = (blk if dw_acc is None
                                          else dw_acc + blk)
                            dwt_blocks.append(dw_acc)      # [npg*mul, T]

                # mix-weight gradients once per window, from the
                # (recomputed) forward accumulator:
                # dwsel_sec = accw_sec^T @ gout_window
                @pl.when(last_ref[ti] == 1)
                def _(w0=w0):
                    accw = accw_ref[...].astype(cd)
                    gw = gout_ref[pl.ds(w0, W), :].astype(cd)
                    for g, mx in enumerate(mix2):
                        d, Wg = mx["d"], mx["Wg"]
                        for sec in mx["secs"]:
                            dws = None
                            for dd in range(d):
                                c0 = (sec["k0"] + dd * sec["npg"]) * mul
                                r0 = mx["out_row"] + dd * Wg
                                c = jax.lax.dot_general(
                                    accw[c0: c0 + sec["npg"] * mul, :],
                                    gw[:, r0: r0 + Wg],
                                    dimension_numbers=(
                                        ((1,), (0,)), ((), ())
                                    ),
                                    preferred_element_type=jnp.float32,
                                )                          # [npg*mul, Wg]
                                dws = c if dws is None else dws + c
                            dwsel_refs[sec["idx"]][...] = (
                                dwsel_refs[sec["idx"]][...] + dws
                            )

                # TP-intermediate cotangent back to the wide layout for
                # the packed C2^T dots
                dmid2 = dw2d * wt2
                dwT2 = jnp.concatenate(dwt_blocks, axis=0)  # [P*mul, T]

                # radial MLP backward (dwT2 -> d edge_radial + dW)
                dw_edge = jnp.transpose(dwT2).astype(cd)
                h_ins = [er.astype(cd)]
                for i in range(nW - 1):
                    h_ins.append(self.fc_act(pre[i]).astype(cd))
                dh = dw_edge                               # [T, dims[-1]]
                for i in reversed(range(nW)):
                    dWi = jax.lax.dot_general(
                        h_ins[i], dh,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                  # [dims[i], dims[i+1]]
                    dW_loc[i] = dWi if dW_loc[i] is None else dW_loc[i] + dWi
                    dh = jax.lax.dot_general(
                        dh, Wvals[i].astype(cd),
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(cd)                           # [T, dims[i]]
                    if i > 0:
                        _, act_vjp = jax.vjp(self.fc_act, pre[i - 1])
                        dh = act_vjp(
                            dh.astype(pre[i - 1].dtype)
                        )[0].astype(cd)
                der_parts.append(dh)

                # adjoint per section pack: contraction dim shrinks to the
                # pack's K8 (the big MXU win of the per-l2 split, block-
                # diagonal packed — see _build_l2_split)
                douter = self._douter_of(
                    dmid2, [c[...] for c in C2T_refs]
                )

                dxb = None
                dsh_rows = []
                for j in range(J):
                    do_j = douter[j * I: (j + 1) * I, :]
                    if j == 0 and self.sh0_const:
                        c = do_j
                    else:
                        srep = jnp.concatenate(
                            [sh[j: j + 1, :]] * mul, axis=1
                        )
                        c = srep * do_j
                    dxb = c if dxb is None else dxb + c
                    if self.compute_dsh:
                        s = jnp.sum(do_j * xb, axis=0)
                        dsh_rows.append(jnp.sum(s.reshape(mul, T), axis=0,
                                                keepdims=True))
                if self.compute_dsh:
                    dsh_parts.append(jnp.concatenate(dsh_rows, axis=0))
                # scatter dx rows back into the window accumulator
                dxT = jnp.transpose(dxb.reshape(I * mul, T))  # [T, I*mul]
                contribX = jax.lax.dot_general(
                    one_s, dxT, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                          # [W, I*mul]
                cur = dx_ref[pl.ds(w0, W), :]
                dx_ref[pl.ds(w0, W), :] = cur + contribX.astype(dx_ref.dtype)

            if self.compute_dsh:
                dsh_ref[...] = jnp.concatenate(dsh_parts, axis=1).astype(
                    dsh_ref.dtype
                )
            else:
                dsh_ref[...] = jnp.zeros(dsh_ref.shape, dsh_ref.dtype)
            der_ref[...] = jnp.concatenate(der_parts, axis=0).astype(
                der_ref.dtype
            )
            for i in range(nW):
                dW_refs[i][...] = dW_refs[i][...] + dW_loc[i]

        return kernel

    # ------------------------------------------------ external-w kernels
    # The grad_order=2 path (force / score training, which differentiates
    # TWICE through the conv) uses kernel variants whose radial weights are
    # an INPUT (computed by the XLA-side MLP) instead of running the MLP
    # in-kernel.  The kernel function is then exactly 4-linear in
    # (x_nodes, shT, wT2, wsel), so its second-order vjp decomposes into
    # first-order kernel calls with cotangents substituted into operand
    # slots (see _make_pallas_fn_ext); the MLP's own (nonlinear) second
    # order stays in XLA where autodiff handles it to any order.
    # sh0_const is disabled here: cotangents substituted into the sh slot
    # do not have a constant first row.

    def _full_fwd_kernel_ext(self):
        import jax.experimental.pallas as pl

        I, mul, T, W = self.I_dim, self.mul, self.tile, self.window
        S = self.n_secs
        cd = self.compute_dtype
        mix2 = self._mix2
        nC2 = len(self._C2s)

        def kernel(win0_ref, first_ref, last_ref, *args):
            (srcl_ref, dstl_ref, x_ref, shT_ref, wT2_ref) = args[:5]
            C2_refs = args[5: 5 + nC2]
            wsel_refs = args[5 + nC2: 5 + nC2 + S]
            acc_ref = args[5 + nC2 + S]
            accw_ref = args[6 + nC2 + S]

            t = pl.program_id(0)
            w0 = pl.multiple_of(win0_ref[t], 8)
            xw = x_ref[pl.ds(w0, W), :].astype(cd)
            srcl = srcl_ref[...]
            dstl = dstl_ref[...]
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
            one_s = (iota == srcl).astype(cd)
            one_d = (iota == dstl).astype(cd)
            g_x = jax.lax.dot_general(
                one_s, xw,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)
            xb = jnp.transpose(g_x).reshape(I, mul * T)
            wT2 = wT2_ref[...].astype(cd)
            _, _, w2d = self._tp_mid2(
                xb, shT_ref[...].astype(cd), wT2,
                [c[...] for c in C2_refs], sh0c=False,
            )
            contrib = jax.lax.dot_general(
                w2d, one_d,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # [K2*mul, W] f32

            @pl.when(t == 0)
            def _():
                acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

            @pl.when(first_ref[t] == 1)
            def _():
                accw_ref[...] = contrib

            @pl.when(first_ref[t] == 0)
            def _():
                accw_ref[...] = accw_ref[...] + contrib

            # The trailing pad run has first=1 but no last marker; the
            # first-order kernels deliberately skip its flush (padded-edge
            # contributions vanish on the masked-weight manifold).  Here
            # the flush is FORCED on the final grid tile: the second-order
            # rule substitutes unmasked cotangents into the w/sh slots, so
            # the fwd/bwd pair must be adjoint as exact multilinear maps —
            # the bwd (like the XLA reference) treats every run as flushed.
            @pl.when((last_ref[t] == 1) | (t == pl.num_programs(0) - 1))
            def _():
                accw = accw_ref[...].astype(cd)
                outs = []
                for g, mx in enumerate(mix2):
                    d = mx["d"]
                    for dd in range(d):
                        blk = None
                        for sec in mx["secs"]:
                            c0 = (sec["k0"] + dd * sec["npg"]) * mul
                            dsec = jax.lax.dot_general(
                                accw[c0: c0 + sec["npg"] * mul, :],
                                wsel_refs[sec["idx"]][...],
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )                             # [W, Wg]
                            blk = dsec if blk is None else blk + dsec
                        outs.append(blk)
                full = jnp.concatenate(outs, axis=1)      # [W, out_rows]
                cur = acc_ref[pl.ds(w0, W), :]
                acc_ref[pl.ds(w0, W), :] = cur + full.astype(acc_ref.dtype)

        return kernel

    def _full_bwd_kernel_ext(self, save_aux: bool = False):
        """``save_aux`` (E3_PALLAS_SAVEMID_EXT): additionally stream the
        per-tile TP intermediate ``mid2`` and the mixing-adjoint gather
        ``dw2d`` (both [K2*mul, T], computed here anyway) to extra outputs.
        The second-order backward (_grad2_fused_kernel) recomputes BOTH
        verbatim — mid2 as its ``mid_c`` substitution term and dw2d from
        the same (wsel, gout)-only dwin build — so loading them there
        skips its per-run mix-adjoint matmuls, the dw2d gather dot and one
        of its three outer builds.  Same streaming pattern as the headline
        kernels' E3_PALLAS_SAVEMID (block-indexed per-tile outputs)."""
        import jax.experimental.pallas as pl

        J, I, mul, T, W = (self.J_dim, self.I_dim, self.mul, self.tile,
                           self.window)
        S = self.n_secs
        cd = self.compute_dtype
        mix2 = self._mix2
        nSec = len(self._secs)
        nC2 = len(self._C2s)
        secs_meta = self._secs

        def kernel(win0_ref, first_ref, last_ref, *args):
            (srcl_ref, dstl_ref, x_ref, shT_ref, wT2_ref) = args[:5]
            C2_refs = args[5: 5 + nC2]
            C2T_refs = args[5 + nC2: 5 + 2 * nC2]
            wsel_refs = args[5 + 2 * nC2: 5 + 2 * nC2 + S]
            gout_ref = args[5 + 2 * nC2 + S]
            n_in = 6 + 2 * nC2 + S
            dx_ref, dsh_ref, dwT2_ref = args[n_in: n_in + 3]
            dwsel_refs = args[n_in + 3: n_in + 3 + S]
            n_o = n_in + 3 + S
            if save_aux:
                mid_out_ref, dw2d_out_ref = args[n_o: n_o + 2]
                n_o += 2
            dwin_ref, accw_ref = args[n_o:]                # scratch

            t = pl.program_id(0)
            w0 = pl.multiple_of(win0_ref[t], 8)

            @pl.when(t == 0)
            def _():
                dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)
                for s in range(S):
                    dwsel_refs[s][...] = jnp.zeros(
                        dwsel_refs[s].shape, dwsel_refs[s].dtype
                    )

            @pl.when(first_ref[t] == 1)
            def _():
                gw = gout_ref[pl.ds(w0, W), :].astype(cd)
                blocks = []
                for si, sm in enumerate(secs_meta):
                    used = 0
                    for g, mx in enumerate(mix2):
                        Wg, d = mx["Wg"], mx["d"]
                        for sec in mx["secs"]:
                            if sec["si"] != si:
                                continue
                            ws_g = wsel_refs[sec["idx"]][...]
                            for dd in range(d):
                                r0 = mx["out_row"] + dd * Wg
                                blocks.append(
                                    jax.lax.dot_general(
                                        ws_g, gw[:, r0: r0 + Wg],
                                        dimension_numbers=(
                                            ((1,), (1,)), ((), ())
                                        ),
                                        preferred_element_type=jnp.float32,
                                    )
                                )                          # [npg*mul, W]
                            used += sec["npg"] * d
                    if sm["K8"] - used:
                        blocks.append(
                            jnp.zeros(((sm["K8"] - used) * mul, W),
                                      jnp.float32)
                        )
                dwin_ref[...] = jnp.concatenate(blocks, axis=0).astype(
                    dwin_ref.dtype
                )
                accw_ref[...] = jnp.zeros(accw_ref.shape, accw_ref.dtype)

            xw = x_ref[pl.ds(w0, W), :].astype(cd)
            srcl = srcl_ref[...]
            dstl = dstl_ref[...]
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
            one_s = (iota == srcl).astype(cd)
            one_d = (iota == dstl).astype(cd)
            g_x = jax.lax.dot_general(
                one_s, xw, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)
            xb = jnp.transpose(g_x).reshape(I, mul * T)
            sh = shT_ref[...].astype(cd)
            wT2 = wT2_ref[...].astype(cd)

            # recompute forward intermediates (remat)
            mid2, wt2, w2d = self._tp_mid2(xb, sh, wT2,
                                           [c[...] for c in C2_refs],
                                           sh0c=False)
            contrib = jax.lax.dot_general(
                w2d, one_d,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [K2*mul, W] f32
            accw_ref[...] = accw_ref[...] + contrib

            dw2d = jax.lax.dot_general(
                dwin_ref[...], one_d,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)                                   # [K2*mul, T]

            if save_aux:
                mid_out_ref[...] = mid2.astype(mid_out_ref.dtype)
                dw2d_out_ref[...] = dw2d.astype(dw2d_out_ref.dtype)

            # radial-weight cotangent, emitted per tile in _p2 row order
            dwp2 = dw2d * mid2
            dwt_blocks = []
            for si in range(nSec):
                for g, mx in enumerate(mix2):
                    d = mx["d"]
                    for sec in mx["secs"]:
                        if sec["si"] != si:
                            continue
                        dw_acc = None
                        for dd in range(d):
                            r0 = (sec["k0"] + dd * sec["npg"]) * mul
                            blk = dwp2[r0: r0 + sec["npg"] * mul, :]
                            dw_acc = blk if dw_acc is None else dw_acc + blk
                        dwt_blocks.append(dw_acc)          # [npg*mul, T]
            dwT2_ref[...] = jnp.concatenate(dwt_blocks, axis=0).astype(
                dwT2_ref.dtype
            )

            # forced trailing-pad-run flush — must mirror the ext fwd
            # kernel so dwsel is the exact m-partial of the same flushed
            # multilinear map (second-order substitutions are unmasked).
            @pl.when((last_ref[t] == 1) | (t == pl.num_programs(0) - 1))
            def _():
                accw = accw_ref[...].astype(cd)
                gw = gout_ref[pl.ds(w0, W), :].astype(cd)
                for g, mx in enumerate(mix2):
                    d, Wg = mx["d"], mx["Wg"]
                    for sec in mx["secs"]:
                        dws = None
                        for dd in range(d):
                            c0 = (sec["k0"] + dd * sec["npg"]) * mul
                            r0 = mx["out_row"] + dd * Wg
                            c = jax.lax.dot_general(
                                accw[c0: c0 + sec["npg"] * mul, :],
                                gw[:, r0: r0 + Wg],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )                              # [npg*mul, Wg]
                            dws = c if dws is None else dws + c
                        dwsel_refs[sec["idx"]][...] = (
                            dwsel_refs[sec["idx"]][...] + dws
                        )

            dmid2 = dw2d * wt2
            douter = self._douter_of(dmid2, [c[...] for c in C2T_refs])

            dxb = None
            dsh_rows = []
            for j in range(J):
                do_j = douter[j * I: (j + 1) * I, :]
                srep = jnp.concatenate([sh[j: j + 1, :]] * mul, axis=1)
                c = srep * do_j
                dxb = c if dxb is None else dxb + c
                s = jnp.sum(do_j * xb, axis=0)
                dsh_rows.append(jnp.sum(s.reshape(mul, T), axis=0,
                                        keepdims=True))
            dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0).astype(
                dsh_ref.dtype
            )
            dxT = jnp.transpose(dxb.reshape(I * mul, T))   # [T, I*mul]
            contribX = jax.lax.dot_general(
                one_s, dxT, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [W, I*mul]
            cur = dx_ref[pl.ds(w0, W), :]
            dx_ref[pl.ds(w0, W), :] = cur + contribX.astype(dx_ref.dtype)

        return kernel

    def _grad2_fused_kernel(self, load_aux: bool = False):
        """One-pass second-order backward for the force-training hot case
        (cotangents present on the dx/dsh/dwT2 outputs, absent on dwsel).

        ``load_aux`` (E3_PALLAS_SAVEMID_EXT): the first-order backward
        (this op's primal, always live in the force step — it produces
        the forces) streamed its per-tile ``mid2`` and ``dw2d``; load
        them here instead of recomputing.  mid2 IS this kernel's
        ``mid_c`` (same (x, sh) substitution), and dw2d is a function of
        (wsel, gout) only — identical between the first- and second-
        order sweeps.  Skips one of the three mid builds, the per-run
        ``dwin`` mixing-adjoint matmuls and the per-tile dw2d gather
        dot, at the cost of two [K2*mul, T] compute-dtype loads/tile.

        Computes, in a single sweep over edge tiles, the sums the pairing
        rule otherwise assembles from three substituted backward calls and
        three substituted forward calls (see _make_pallas_fn_ext):

            c_x = Bx(s->cs) + Bx(w->cw)         [b2[0] + b3[0]]
            c_s = Bs(x->cx) + Bs(w->cw)         [b1[1] + b3[1]]
            c_w = Bw(x->cx) + Bw(s->cs)         [b1[2] + b2[2]]
            c_m = Bm(x->cx) + Bm(s->cs) + Bm(w->cw)
            c_g = F(x->cx)  + F(s->cs)  + F(w->cw)

        Shared work that the substituted calls would each redo exactly:
        the one-hot gather/scatter operators, the run-level ``dwin``
        mixing adjoint and its per-tile scatter ``dw2d`` (functions of
        (wsel, gout) only — identical across all three backward calls),
        and the ``douter`` CG-adjoint matmuls for the two calls that share
        the unsubstituted radial weights.  The three forward calls
        collapse completely: their per-run accumulators sum, so c_g and
        c_m share ONE accumulated ``accw`` (one contrib matmul per tile)
        and one mix/flush each per run."""
        import jax.experimental.pallas as pl

        J, I, mul, T, W = (self.J_dim, self.I_dim, self.mul, self.tile,
                           self.window)
        S = self.n_secs
        cd = self.compute_dtype
        mix2 = self._mix2
        nSec = len(self._secs)
        nC2 = len(self._C2s)
        secs_meta = self._secs

        def kernel(win0_ref, first_ref, last_ref, *args):
            (srcl_ref, dstl_ref, x_ref, cx_ref, shT_ref, cshT_ref,
             wT2_ref, cwT_ref) = args[:8]
            na = 8
            if load_aux:
                mid_in_ref, dw2d_in_ref = args[8:10]
                na = 10
            C2_refs = args[na: na + nC2]
            C2T_refs = args[na + nC2: na + 2 * nC2]
            wsel_refs = args[na + 2 * nC2: na + 2 * nC2 + S]
            gout_ref = args[na + 2 * nC2 + S]
            n_in = na + 1 + 2 * nC2 + S
            dx_ref, dsh_ref, dwT2_ref = args[n_in: n_in + 3]
            dwsel_refs = args[n_in + 3: n_in + 3 + S]
            accg_ref = args[n_in + 3 + S]
            if load_aux:
                dwin_ref = None
                (accw_ref,) = args[n_in + 4 + S:]          # scratch
            else:
                dwin_ref, accw_ref = args[n_in + 4 + S:]   # scratch

            t = pl.program_id(0)
            w0 = pl.multiple_of(win0_ref[t], 8)

            @pl.when(t == 0)
            def _():
                dx_ref[...] = jnp.zeros(dx_ref.shape, dx_ref.dtype)
                accg_ref[...] = jnp.zeros(accg_ref.shape, accg_ref.dtype)
                for s in range(S):
                    dwsel_refs[s][...] = jnp.zeros(
                        dwsel_refs[s].shape, dwsel_refs[s].dtype
                    )

            @pl.when(first_ref[t] == 1)
            def _():
                if not load_aux:
                    # mixing adjoint for this run — identical for every
                    # substituted backward call (depends on wsel, gout only)
                    gw = gout_ref[pl.ds(w0, W), :].astype(cd)
                    blocks = []
                    for si, sm in enumerate(secs_meta):
                        used = 0
                        for g, mx in enumerate(mix2):
                            Wg, d = mx["Wg"], mx["d"]
                            for sec in mx["secs"]:
                                if sec["si"] != si:
                                    continue
                                ws_g = wsel_refs[sec["idx"]][...]
                                for dd in range(d):
                                    r0 = mx["out_row"] + dd * Wg
                                    blocks.append(
                                        jax.lax.dot_general(
                                            ws_g, gw[:, r0: r0 + Wg],
                                            dimension_numbers=(
                                                ((1,), (1,)), ((), ())
                                            ),
                                            preferred_element_type=(
                                                jnp.float32
                                            ),
                                        )
                                    )                      # [npg*mul, W]
                                used += sec["npg"] * d
                        if sm["K8"] - used:
                            blocks.append(
                                jnp.zeros(((sm["K8"] - used) * mul, W),
                                          jnp.float32)
                            )
                    dwin_ref[...] = jnp.concatenate(
                        blocks, axis=0
                    ).astype(dwin_ref.dtype)
                accw_ref[...] = jnp.zeros(accw_ref.shape, accw_ref.dtype)

            srcl = srcl_ref[...]
            dstl = dstl_ref[...]
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 0)
            one_s = (iota == srcl).astype(cd)
            one_d = (iota == dstl).astype(cd)

            def gather(ref):
                g_v = jax.lax.dot_general(
                    one_s, ref[pl.ds(w0, W), :].astype(cd),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)
                return jnp.transpose(g_v).reshape(I, mul * T)

            xb = gather(x_ref)
            cxb = gather(cx_ref)
            sh = shT_ref[...].astype(cd)
            cshv = cshT_ref[...].astype(cd)
            C2vs = [c[...] for c in C2_refs]

            # three substitution variants of the TP intermediate; the two
            # radial-weight factors (true w, cotangent cw)
            mid_a = self._mid2_of(cxb, sh, C2vs, False)    # (x->cx, s, w)
            mid_b = self._mid2_of(xb, cshv, C2vs, False)   # (x, s->cs, w)
            if load_aux:                                   # (x, s, w->cw)
                mid_c = mid_in_ref[...].astype(cd)
            else:
                mid_c = self._mid2_of(xb, sh, C2vs, False)
            wt_w = self._wt2_of(wT2_ref[...].astype(cd))
            wt_c = self._wt2_of(cwT_ref[...].astype(cd))

            # c_g and c_m share one accumulator: the three forward flushes
            # and three dwsel flushes are linear in accw, so the summed
            # per-run accumulation feeds both
            w2d_sum = (mid_a + mid_b) * wt_w + mid_c * wt_c
            contrib = jax.lax.dot_general(
                w2d_sum, one_d,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [K2*mul, W]
            accw_ref[...] = accw_ref[...] + contrib

            if load_aux:
                dw2d = dw2d_in_ref[...].astype(cd)         # [K2*mul, T]
            else:
                dw2d = jax.lax.dot_general(
                    dwin_ref[...], one_d,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(cd)                               # [K2*mul, T]

            # c_w: the b1/b2 radial cotangents share dw2d; emit the sum
            dwp_sum = dw2d * (mid_a + mid_b)
            dwt_blocks = []
            for si in range(nSec):
                for g, mx in enumerate(mix2):
                    d = mx["d"]
                    for sec in mx["secs"]:
                        if sec["si"] != si:
                            continue
                        dw_acc = None
                        for dd in range(d):
                            r0 = (sec["k0"] + dd * sec["npg"]) * mul
                            blk = dwp_sum[r0: r0 + sec["npg"] * mul, :]
                            dw_acc = blk if dw_acc is None else dw_acc + blk
                        dwt_blocks.append(dw_acc)          # [npg*mul, T]
            dwT2_ref[...] = jnp.concatenate(dwt_blocks, axis=0).astype(
                dwT2_ref.dtype
            )

            # forced trailing-pad-run flush — see _full_fwd_kernel_ext
            @pl.when((last_ref[t] == 1) | (t == pl.num_programs(0) - 1))
            def _():
                accw = accw_ref[...].astype(cd)
                gw = gout_ref[pl.ds(w0, W), :].astype(cd)
                outs = []
                for g, mx in enumerate(mix2):
                    d, Wg = mx["d"], mx["Wg"]
                    for dd in range(d):
                        blk = None
                        for sec in mx["secs"]:
                            c0 = (sec["k0"] + dd * sec["npg"]) * mul
                            rows = accw[c0: c0 + sec["npg"] * mul, :]
                            # c_m flush for this (sec, dd)
                            dws = jax.lax.dot_general(
                                rows, gw[:, mx["out_row"] + dd * Wg:
                                         mx["out_row"] + (dd + 1) * Wg],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )                              # [npg*mul, Wg]
                            dwsel_refs[sec["idx"]][...] = (
                                dwsel_refs[sec["idx"]][...] + dws
                            )
                            # c_g mix flush for this (sec, dd)
                            dsec = jax.lax.dot_general(
                                rows, wsel_refs[sec["idx"]][...],
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )                              # [W, Wg]
                            blk = dsec if blk is None else blk + dsec
                        outs.append(blk)
                full = jnp.concatenate(outs, axis=1)       # [W, out_rows]
                cur = accg_ref[pl.ds(w0, W), :]
                accg_ref[pl.ds(w0, W), :] = cur + full.astype(accg_ref.dtype)

            # douter CG adjoints (packed C^T dots): ONE chain for the
            # shared-w calls (b1/b2), one for the cw substitution (b3)
            C2Tvals = [c[...] for c in C2T_refs]
            douter_w = self._douter_of(dw2d * wt_w, C2Tvals)
            douter_c = self._douter_of(dw2d * wt_c, C2Tvals)

            dxb = None
            dsh_rows = []
            for j in range(J):
                dow = douter_w[j * I: (j + 1) * I, :]
                doc = douter_c[j * I: (j + 1) * I, :]
                srep_s = jnp.concatenate([sh[j: j + 1, :]] * mul, axis=1)
                srep_cs = jnp.concatenate([cshv[j: j + 1, :]] * mul, axis=1)
                c = srep_cs * dow + srep_s * doc           # b2[0] + b3[0]
                dxb = c if dxb is None else dxb + c
                s_val = (jnp.sum(dow * cxb, axis=0)        # b1[1]
                         + jnp.sum(doc * xb, axis=0))      # b3[1]
                dsh_rows.append(jnp.sum(s_val.reshape(mul, T), axis=0,
                                        keepdims=True))
            dsh_ref[...] = jnp.concatenate(dsh_rows, axis=0).astype(
                dsh_ref.dtype
            )
            dxT = jnp.transpose(dxb.reshape(I * mul, T))   # [T, I*mul]
            contribX = jax.lax.dot_general(
                one_s, dxT, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                              # [W, I*mul]
            cur = dx_ref[pl.ds(w0, W), :]
            dx_ref[pl.ds(w0, W), :] = cur + contribX.astype(dx_ref.dtype)

        return kernel

    def _make_pallas_fn_ext(self, N, E, win0, tile_first, tile_last,
                            srcl, dstl):
        """Twice-differentiable conv core for the grad_order=2 path.

        Returns ``f2(x_nodes, shT, wT2, wsel) -> acc`` with a custom vjp
        whose backward (``g2`` = the Pallas backward kernel, i.e. the force
        path) carries its OWN custom vjp implementing the exact
        second-order cotangents.

        The core F is 4-linear in its operands, so with first-order
        outputs ``do_i = (dF/do_i)^T g`` the second-order rule is a plain
        pairing: for incoming cotangents ``c_i`` (on ``do_i``),

            c_g    = sum_i F(o with slot i -> c_i)
            c_{oj} = sum_{i != j} [j-output of Bk(o with slot i -> c_i, g)]

        where Bk is the backward kernel itself — each of its outputs is
        independent of its own operand slot, so one substituted Bk call
        yields the three cross terms for that slot.  4 forward + 4 backward
        kernel calls total, all first-order Pallas.  Third-order autodiff
        is not provided (raises on use)."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        J, I, mul, T = self.J_dim, self.I_dim, self.mul, self.tile
        P = len(self.paths)
        W = self.window
        cd = self.compute_dtype
        C2s, C2Ts = self._C2s, self._C2Ts
        K2 = self.K2
        out_rows = self.out_rows
        # stream the first-order backward's per-tile mid2/dw2d to HBM so
        # the second-order backward loads them instead of recomputing
        # (the ext-path counterpart of E3_PALLAS_SAVEMID; the g2 primal
        # is always live in a force step — it produces the forces — so
        # the streams cost only the HBM writes).  Default OFF until the
        # on-device A/B lands (r5 queue2); =1 enables.
        save_aux = os.environ.get("E3_PALLAS_SAVEMID_EXT", "0") == "1"
        fwd_kernel = self._full_fwd_kernel_ext()
        bwd_kernel = self._full_bwd_kernel_ext()
        bwd_kernel_aux = (self._full_bwd_kernel_ext(save_aux=True)
                          if save_aux else None)
        interpret = _use_interpret()
        grid = (E // T,)

        def edge_spec(shape):
            return pl.BlockSpec(shape, lambda t, *_: (0, t))

        def run_fwd(x_nodes, shT, wT2, wsel):
            gspec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, T), lambda t, *_: (0, t)),
                    pl.BlockSpec((1, T), lambda t, *_: (0, t)),
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),
                    edge_spec((J, T)),
                    edge_spec((P * mul, T)),
                ] + [
                    pl.BlockSpec(c.shape, lambda t, *_: (0, 0)) for c in C2s
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ],
                out_specs=pl.BlockSpec((N, out_rows), lambda t, *_: (0, 0)),
                scratch_shapes=[pltpu.VMEM((K2 * mul, W), jnp.float32)],
            )
            return pl.pallas_call(
                fwd_kernel,
                grid_spec=gspec,
                out_shape=jax.ShapeDtypeStruct((N, out_rows), cd),
                interpret=interpret,
                **_compiler_params(interpret),
            )(win0, tile_first, tile_last, srcl, dstl, x_nodes, shT, wT2,
              *C2s, *wsel)

        def run_bwd(x_nodes, shT, wT2, wsel, gout, want_aux=False):
            aux_out_specs = ([edge_spec((K2 * mul, T))] * 2 if want_aux
                             else [])
            aux_out_shapes = ([jax.ShapeDtypeStruct((K2 * mul, E), cd)] * 2
                              if want_aux else [])
            gspec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, T), lambda t, *_: (0, t)),
                    pl.BlockSpec((1, T), lambda t, *_: (0, t)),
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),
                    edge_spec((J, T)),
                    edge_spec((P * mul, T)),
                ] + [
                    *[pl.BlockSpec(c.shape, lambda t, *_: (0, 0))
                      for c in C2s],
                    *[pl.BlockSpec(c.shape, lambda t, *_: (0, 0))
                      for c in C2Ts],
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ] + [
                    pl.BlockSpec((N, out_rows), lambda t, *_: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),  # dx
                    edge_spec((J, T)),                                 # dsh
                    edge_spec((P * mul, T)),                           # dwT2
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ] + aux_out_specs,                         # mid2, dw2d
                scratch_shapes=[
                    pltpu.VMEM((K2 * mul, W), cd),             # dwin
                    pltpu.VMEM((K2 * mul, W), jnp.float32),    # accw (remat)
                ],
            )
            out_shapes = [
                jax.ShapeDtypeStruct((N, I * mul), jnp.float32),
                jax.ShapeDtypeStruct((J, E), cd),
                jax.ShapeDtypeStruct((P * mul, E), cd),
            ] + [
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wsel
            ] + aux_out_shapes
            outs = pl.pallas_call(
                bwd_kernel_aux if want_aux else bwd_kernel,
                grid_spec=gspec,
                out_shape=out_shapes,
                interpret=interpret,
                **_compiler_params(interpret),
            )(win0, tile_first, tile_last, srcl, dstl, x_nodes, shT, wT2,
              *C2s, *C2Ts, *wsel, gout)
            nw = len(wsel)
            if want_aux:
                return (outs[0], outs[1], outs[2], tuple(outs[3: 3 + nw]),
                        outs[3 + nw], outs[4 + nw])
            return outs[0], outs[1], outs[2], tuple(outs[3:])

        grad2_kernel = self._grad2_fused_kernel(load_aux=save_aux)

        def run_grad2(x_nodes, cx, shT, csh, wT2, cw, wsel, gout,
                      aux=None):
            """One-pass (c_x, c_s, c_w, c_m, c_g) for the force-training
            hot case — see _grad2_fused_kernel.  ``aux``: the (mid2,
            dw2d) streams saved by the first-order backward (present iff
            save_aux)."""
            aux_in_specs = ([edge_spec((K2 * mul, T))] * 2 if aux is not None
                            else [])
            gspec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, T), lambda t, *_: (0, t)),
                    pl.BlockSpec((1, T), lambda t, *_: (0, t)),
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),
                    edge_spec((J, T)),
                    edge_spec((J, T)),
                    edge_spec((P * mul, T)),
                    edge_spec((P * mul, T)),
                ] + aux_in_specs + [
                    *[pl.BlockSpec(c.shape, lambda t, *_: (0, 0))
                      for c in C2s],
                    *[pl.BlockSpec(c.shape, lambda t, *_: (0, 0))
                      for c in C2Ts],
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ] + [
                    pl.BlockSpec((N, out_rows), lambda t, *_: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),  # c_x
                    edge_spec((J, T)),                                 # c_s
                    edge_spec((P * mul, T)),                           # c_w
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ] + [
                    pl.BlockSpec((N, out_rows), lambda t, *_: (0, 0)),  # c_g
                ],
                scratch_shapes=(
                    ([] if aux is not None
                     else [pltpu.VMEM((K2 * mul, W), cd)])     # dwin
                    + [pltpu.VMEM((K2 * mul, W), jnp.float32)]  # accw
                ),
            )
            out_shapes = [
                jax.ShapeDtypeStruct((N, I * mul), jnp.float32),
                jax.ShapeDtypeStruct((J, E), cd),
                jax.ShapeDtypeStruct((P * mul, E), cd),
            ] + [
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wsel
            ] + [
                jax.ShapeDtypeStruct((N, out_rows), cd),
            ]
            aux_ins = tuple(aux) if aux is not None else ()
            outs = pl.pallas_call(
                grad2_kernel,
                grid_spec=gspec,
                out_shape=out_shapes,
                interpret=interpret,
                **_compiler_params(interpret),
            )(win0, tile_first, tile_last, srcl, dstl, x_nodes, cx,
              shT, csh, wT2, cw, *aux_ins, *C2s, *C2Ts, *wsel, gout)
            return (outs[0], outs[1], outs[2], tuple(outs[3: 3 + len(wsel)]),
                    outs[3 + len(wsel)])

        @jax.custom_vjp
        def g2(x_nodes, shT, wT2, wsel, gout):
            # with save_aux the primal returns two extra outputs (the
            # mid2/dw2d streams); f2_bwd discards them, so their incoming
            # cotangents in g2_bwd are always symbolic zeros
            return run_bwd(x_nodes, shT, wT2, wsel, gout,
                           want_aux=save_aux)

        def g2_fwd(x_nodes, shT, wT2, wsel, gout):
            # Call g2 itself (not run_bwd): under grad-of-grad the fwd is
            # invoked with the OUTER jvp trace's tracers still attached, and
            # a raw pallas_call has no jvp rule (scalar-prefetch grids).
            # Re-entering the custom_vjp peels one trace level per call and
            # bottoms out at concrete values.
            # symbolic_zeros=True wraps every leaf in a CustomVJPPrimal.
            x_nodes, shT, wT2, wsel, gout = jax.tree_util.tree_map(
                lambda p: p.value, (x_nodes, shT, wT2, wsel, gout),
                is_leaf=lambda p: hasattr(p, "perturbed"),
            )
            outs = g2(x_nodes, shT, wT2, wsel, gout)
            aux = outs[4:6] if save_aux else None
            return outs, (x_nodes, shT, wT2, wsel, gout, aux)

        def g2_bwd(res, cots):
            from jax.custom_derivatives import SymbolicZero

            x_nodes, shT, wT2, wsel, gout, aux = res
            cx, csh, cw, cwsel = cots[:4]
            # symbolic_zeros: a cotangent slot that is structurally zero
            # (e.g. the force pass discards the dwsel output, so its
            # cotangent never materializes) skips that slot's substituted
            # kernel calls entirely — one bwd + one fwd pass per zero slot.
            have_x = not isinstance(cx, SymbolicZero)
            have_s = not isinstance(csh, SymbolicZero)
            have_w = not isinstance(cw, SymbolicZero)
            have_m = any(not isinstance(c, SymbolicZero) for c in cwsel)
            cx = cx.astype(cd) if have_x else None
            csh = csh.astype(cd) if have_s else None
            cw = cw.astype(cd) if have_w else None
            cwsel = tuple(
                jnp.zeros(w.shape, cd) if isinstance(c, SymbolicZero)
                else c.astype(cd)
                for c, w in zip(cwsel, wsel)
            ) if have_m else None
            if have_x and have_s and have_w and not have_m:
                # force-training hot case: one fused kernel computes every
                # cotangent sum (3 bwd + 3 fwd substituted calls collapse)
                c_x, c_s, c_w, c_m, c_g = run_grad2(
                    x_nodes, cx, shT, csh, wT2, cw, wsel, gout, aux=aux
                )
                return (
                    c_x.astype(x_nodes.dtype), c_s.astype(shT.dtype),
                    c_w.astype(wT2.dtype),
                    tuple(c.astype(w.dtype) for c, w in zip(c_m, wsel)),
                    c_g.astype(gout.dtype),
                )
            # pairing rule: one substituted backward call per operand slot
            b1 = run_bwd(cx, shT, wT2, wsel, gout) if have_x else None
            b2 = run_bwd(x_nodes, csh, wT2, wsel, gout) if have_s else None
            b3 = run_bwd(x_nodes, shT, cw, wsel, gout) if have_w else None
            b4 = run_bwd(x_nodes, shT, wT2, cwsel, gout) if have_m else None

            def total(parts, zero):
                parts = [p for p in parts if p is not None]
                if not parts:
                    return zero()
                acc = parts[0]
                for p in parts[1:]:
                    acc = jax.tree_util.tree_map(jnp.add, acc, p)
                return acc

            c_x = total([b and b[0] for b in (b2, b3, b4)],
                        lambda: jnp.zeros(x_nodes.shape, jnp.float32))
            c_s = total([b and b[1] for b in (b1, b3, b4)],
                        lambda: jnp.zeros(shT.shape, cd))
            c_w = total([b and b[2] for b in (b1, b2, b4)],
                        lambda: jnp.zeros(wT2.shape, cd))
            c_m = total([b and b[3] for b in (b1, b2, b3)],
                        lambda: tuple(jnp.zeros(w.shape, jnp.float32)
                                      for w in wsel))
            c_g = total(
                [run_fwd(cx, shT, wT2, wsel).astype(jnp.float32)
                 if have_x else None,
                 run_fwd(x_nodes, csh, wT2, wsel).astype(jnp.float32)
                 if have_s else None,
                 run_fwd(x_nodes, shT, cw, wsel).astype(jnp.float32)
                 if have_w else None,
                 run_fwd(x_nodes, shT, wT2, cwsel).astype(jnp.float32)
                 if have_m else None],
                lambda: jnp.zeros(gout.shape, gout.dtype),
            )
            return (
                c_x.astype(x_nodes.dtype), c_s.astype(shT.dtype),
                c_w.astype(wT2.dtype),
                tuple(c.astype(w.dtype) for c, w in zip(c_m, wsel)),
                c_g.astype(gout.dtype),
            )

        g2.defvjp(g2_fwd, g2_bwd, symbolic_zeros=True)

        @jax.custom_vjp
        def f2(x_nodes, shT, wT2, wsel):
            return run_fwd(x_nodes, shT, wT2, wsel)

        def f2_fwd(x_nodes, shT, wT2, wsel):
            # f2, not run_fwd — see g2_fwd for why (outer-trace peeling).
            return f2(x_nodes, shT, wT2, wsel), (
                x_nodes, shT, wT2, wsel
            )

        def f2_bwd(res, gout):
            x_nodes, shT, wT2, wsel = res
            dx, dsh, dwT2, dwsel = g2(x_nodes, shT, wT2, wsel, gout)[:4]
            return (
                dx.astype(x_nodes.dtype), dsh.astype(shT.dtype),
                dwT2.astype(wT2.dtype),
                tuple(d.astype(w.dtype) for d, w in zip(dwsel, wsel)),
            )

        f2.defvjp(f2_fwd, f2_bwd)
        return f2

    def apply_grad2(self, fc_params, linear_params, x, edge_radial, sh,
                    win0, tile_first, tile_last, src_local, dst_local,
                    num_nodes: int, pre_scale=None, out_dtype=jnp.float32,
                    x_table=None, extra_io=None, raw_out=False):
        """Twice-differentiable full conv (force / score training).

        Same math as ``__call__`` but the radial MLP, operand layout prep
        and output formatting run in XLA (differentiable to any order);
        only the 4-linear conv core is a Pallas custom-vjp pair.  See
        _make_pallas_fn_ext for the second-order structure.

        ``x_table``/``extra_io``/``raw_out`` mirror ``__call__``'s
        kernel-layout handoff (all three legs are pure XLA here, so the
        kl plumbing is differentiable to any order): consume the node
        table directly, fold sc blocks into the output, and emit the
        pre-transpose blocks for the next layer."""
        cd = self.compute_dtype
        E = sh.shape[0]
        T = self.tile
        assert E % T == 0

        if x_table is not None:
            # kl handoff: x IS already the node table — skip the (m, d)
            # transpose prep (and its adjoint/tangent at every
            # differentiation level of the force step)
            x_nodes = x_table.astype(cd)
        else:
            x_nodes = self._prep_x_nodes(x, num_nodes)
        shT = jnp.transpose(sh, (1, 0)).astype(cd)
        # transposed radial MLP: every intermediate keeps E minor, and the
        # [P*mul, E] operand comes out directly as a major-axis row gather —
        # the [E, ncols] <-> [ncols, E] transpose (and its adjoint/tangent
        # instances at every differentiation level) used to cost ~10 ms of
        # the force step
        erT = jnp.transpose(edge_radial, (1, 0))         # [nb, E] (tiny)
        # _p2 row order via a column permutation of the LAST MLP weight
        # ([nh, P_tpe*mul], tiny) rather than a row gather of the [P*mul, E]
        # activation: the activation gather (and its scatter adjoint) was
        # re-materialized at every differentiation level of the force step
        # — ~11.7 ms of a 50 ms step (trace 2026-08-19).  Permuting weight
        # columns commutes with apply_T's per-layer 1/sqrt(fan_in) scaling.
        n_last = len(self.fc_dims) - 2
        fc_p2 = dict(fc_params)
        fc_p2[f"w{n_last}"] = fc_params[f"w{n_last}"][:, self._wcol_perm2]
        wT2 = self.fc.apply_T(
            fc_p2, erT, compute_dtype=str(np.dtype(cd)),
        ).astype(cd)                             # [P*mul, E], _p2 rows
        wsel = tuple(self._prep_wsel2(linear_params))
        if pre_scale is not None:
            wsel = tuple(w * pre_scale for w in wsel)

        srcl = src_local.reshape(1, E).astype(jnp.int32)
        dstl = dst_local.reshape(1, E).astype(jnp.int32)
        f2 = self._make_pallas_fn_ext(
            num_nodes, E, win0.astype(jnp.int32),
            tile_first.astype(jnp.int32), tile_last.astype(jnp.int32),
            srcl, dstl,
        )
        acc = f2(x_nodes, shT, wT2, wsel)
        out = self._format_output(acc, num_nodes, extra_io, out_dtype)
        if raw_out:
            return out, self._output_blocks(acc, num_nodes, extra_io)
        return out

    # ------------------------------------------------------------ pallas op
    def _make_pallas_fn(self, N, E, win0, tile_first, tile_last, srcl, dstl):
        """Build the custom_vjp'd op closing over this call's edge layout."""
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        J, I, mul, T = self.J_dim, self.I_dim, self.mul, self.tile
        nb = self.fc_dims[0]
        nW = len(self.fc_dims) - 1
        W = self.window
        cd = self.compute_dtype
        C2s, C2Ts = self._C2s, self._C2Ts
        K2 = self.K2
        out_rows = self.out_rows
        # edge tiles per grid step (see _full_fwd_kernel); falls back to 1
        # whenever the edge capacity is not a multiple of B*T
        B = _tile_batch_env()
        if E % (B * T):
            B = 1
        # stream the TP intermediate fwd -> bwd instead of rematerializing
        # it (skips the bwd gather, outer build and fwd CG dots at the cost
        # of one [K2*mul, E] compute-dtype HBM round trip per direction)
        # Default ON: measured 4510 -> 5120 g/s on the headline config
        # (TPU v5e, /tmp/r4q4.log A/B interleave); E3_PALLAS_SAVEMID=0
        # restores the remat backward.
        save_mid = (os.environ.get("E3_PALLAS_SAVEMID", "1") != "0"
                    and B == 1)
        fwd_kernel = self._full_fwd_kernel(B)
        fwd_kernel_mid = (self._full_fwd_kernel(B, save_mid=True)
                          if save_mid else None)
        bwd_kernel = self._full_bwd_kernel(B, load_mid=save_mid)
        bwd_has_x = (not save_mid) or self.compute_dsh
        interpret = _use_interpret()
        grid = (E // (B * T),)
        BT = B * T

        def edge_spec(shape):
            return pl.BlockSpec(shape, lambda t, *_: (0, t))

        def run_fwd(x_nodes, shT, er, Ws, wsel, with_mid=False):
            out_specs = pl.BlockSpec((N, out_rows), lambda t, *_: (0, 0))
            out_shape = jax.ShapeDtypeStruct((N, out_rows), cd)
            if with_mid:
                out_specs = [out_specs, edge_spec((K2 * mul, BT))]
                out_shape = [out_shape,
                             jax.ShapeDtypeStruct((K2 * mul, E), cd)]
            gspec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, BT), lambda t, *_: (0, t)),  # src local
                    pl.BlockSpec((1, BT), lambda t, *_: (0, t)),  # dst local
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),
                    edge_spec((J, BT)),
                    pl.BlockSpec((BT, nb), lambda t, *_: (t, 0)),
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in Ws
                ] + [
                    pl.BlockSpec(c.shape, lambda t, *_: (0, 0)) for c in C2s
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ],
                out_specs=out_specs,
                scratch_shapes=[pltpu.VMEM((K2 * mul, W), jnp.float32)],
            )
            return pl.pallas_call(
                fwd_kernel_mid if with_mid else fwd_kernel,
                grid_spec=gspec,
                # the node accumulator leaves the kernel in compute dtype:
                # each exclusive window is written exactly once (f32 mix
                # dots, rounded on store), and the downstream formatting /
                # gate run in compute dtype anyway — halves the formatting
                # HBM traffic
                out_shape=out_shape,
                interpret=interpret,
                **_compiler_params(interpret),
            )(win0, tile_first, tile_last, srcl, dstl, x_nodes, shT, er,
              *Ws, *C2s, *wsel)

        def run_bwd(x_nodes, shT, er, Ws, wsel, gout, mid=None):
            x_in_specs = ([pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0))]
                          if bwd_has_x else [])
            mid_in_specs = [edge_spec((K2 * mul, BT))] if save_mid else []
            fwd_C2_specs = ([] if save_mid else
                            [pl.BlockSpec(c.shape, lambda t, *_: (0, 0))
                             for c in C2s])
            gspec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((1, BT), lambda t, *_: (0, t)),
                    pl.BlockSpec((1, BT), lambda t, *_: (0, t)),
                ] + x_in_specs + [
                    edge_spec((J, BT)),
                    pl.BlockSpec((BT, nb), lambda t, *_: (t, 0)),
                ] + mid_in_specs + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in Ws
                ] + [
                    *fwd_C2_specs,
                    *[pl.BlockSpec(c.shape, lambda t, *_: (0, 0))
                      for c in C2Ts],
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ] + [
                    pl.BlockSpec((N, out_rows), lambda t, *_: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((N, I * mul), lambda t, *_: (0, 0)),  # dx
                    edge_spec((J, BT)),                            # dsh
                    pl.BlockSpec((BT, nb), lambda t, *_: (t, 0)),      # der
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in Ws
                ] + [
                    pl.BlockSpec(w.shape, lambda t, *_: (0, 0)) for w in wsel
                ],
                scratch_shapes=[
                    pltpu.VMEM((K2 * mul, W), cd),             # dwin
                    pltpu.VMEM((K2 * mul, W), jnp.float32),    # accw (remat)
                ],
            )
            out_shapes = [
                jax.ShapeDtypeStruct((N, I * mul), jnp.float32),
                jax.ShapeDtypeStruct((J, E), cd),
                jax.ShapeDtypeStruct((E, nb), jnp.float32),
            ] + [
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in Ws
            ] + [
                jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wsel
            ]
            ins = [win0, tile_first, tile_last, srcl, dstl]
            if bwd_has_x:
                ins.append(x_nodes)
            ins += [shT, er]
            if save_mid:
                ins.append(mid)
            ins += [*Ws]
            if not save_mid:
                ins += [*C2s]
            ins += [*C2Ts, *wsel, gout]
            return pl.pallas_call(
                bwd_kernel,
                grid_spec=gspec,
                out_shape=out_shapes,
                interpret=interpret,
                **_compiler_params(interpret),
            )(*ins)

        @jax.custom_vjp
        def f(x_nodes, shT, er, Ws, wsel):
            return run_fwd(x_nodes, shT, er, Ws, wsel)

        def f_fwd(x_nodes, shT, er, Ws, wsel):
            # when the savemid backward never reads x (compute_dsh off),
            # keep only a dtype-carrying scalar in the residuals — holding
            # the whole [N, I*mul] table would raise peak HBM under grad
            x_res = (x_nodes if bwd_has_x
                     else jnp.zeros((), x_nodes.dtype))
            if save_mid:
                acc, mid = run_fwd(x_nodes, shT, er, Ws, wsel, with_mid=True)
                return acc, (x_res, shT, er, Ws, wsel, mid)
            return run_fwd(x_nodes, shT, er, Ws, wsel), (
                x_res, shT, er, Ws, wsel, None
            )

        def f_bwd(res, gout):
            x_res, shT, er, Ws, wsel, mid = res
            x_nodes = x_res if bwd_has_x else None
            x_dtype = x_res.dtype
            outs = run_bwd(x_nodes, shT, er, Ws, wsel, gout, mid=mid)
            dx, dsh, der = outs[:3]
            dWs = list(outs[3: 3 + len(Ws)])
            dwsel = list(outs[3 + len(Ws):])
            return (
                dx.astype(x_dtype), dsh, der.astype(er.dtype),
                [d.astype(w.dtype) for d, w in zip(dWs, Ws)],
                [d.astype(w.dtype) for d, w in zip(dwsel, wsel)],
            )

        f.defvjp(f_fwd, f_bwd)
        return f

    # ------------------------------------------------------------ interface
    def __call__(self, fc_params, linear_params, x, edge_radial, sh,
                 win0, tile_first, tile_last, src_local, dst_local,
                 num_nodes: int, pre_scale=None, out_dtype=jnp.float32,
                 extra_io=None, raw_out=False, x_table=None):
        """Full conv on a tile-aligned batch; returns node features
        [num_nodes, out_dim] (the segment-sum is internal).

        ``extra_io``: optional {io: [N, d_io, mul_out]} component-major
        blocks (e.g. the species self-connection, sc.py apply_raw) folded
        in BEFORE the output transpose, so the node-sized (m, d) relayout
        is paid once for the sum instead of once per term.

        ``raw_out``: additionally return the pre-transpose per-io blocks
        (``_output_blocks``) for the kernel-layout inter-layer handoff.
        ``x_table``: consume ``x`` as an already-prepped node table
        [N, I*mul] (the previous layer's kl output) instead of irreps
        columns; ``x`` is ignored when given."""
        cd = self.compute_dtype
        E = sh.shape[0]
        T = self.tile
        mul, I = self.mul, self.I_dim
        assert E % T == 0

        if x_table is not None:
            # kl handoff: x IS already the node table (the previous
            # layer's gated _output_blocks, Gate.apply_kl) — skip the
            # (m, d) transpose prep
            x_nodes = x_table.astype(cd)
        else:
            x_nodes = self._prep_x_nodes(x, num_nodes)
        shT = jnp.transpose(sh, (1, 0)).astype(cd)
        er = edge_radial.astype(jnp.float32)
        Ws = []
        for i in range(len(self.fc_dims) - 1):
            w = fc_params[f"w{i}"] / (float(self.fc_dims[i]) ** 0.5)
            Ws.append(w.astype(cd))
        Ws[-1] = Ws[-1][:, self._wcol_perm2]
        wsel = self._prep_wsel2(linear_params)
        if pre_scale is not None:
            wsel = [w * pre_scale for w in wsel]

        srcl = src_local.reshape(1, E).astype(jnp.int32)
        dstl = dst_local.reshape(1, E).astype(jnp.int32)
        f = self._make_pallas_fn(num_nodes, E, win0.astype(jnp.int32),
                                 tile_first.astype(jnp.int32),
                                 tile_last.astype(jnp.int32),
                                 srcl, dstl)
        acc = f(x_nodes, shT, er, Ws, wsel)     # [N, out_rows] compute dtype
        out = self._format_output(acc, num_nodes, extra_io, out_dtype)
        if raw_out:
            # return the formatted columns AND the pre-transpose blocks;
            # whichever branch the caller leaves unconsumed is dead code
            # under jit (only the last layer's formatted output feeds the
            # head), so both cost nothing extra
            return out, self._output_blocks(acc, num_nodes, extra_io)
        return out

    def _prep_x_nodes(self, x, num_nodes):
        """x [N, irreps layout] -> node table [N, (i, u)] in compute dtype."""
        cd = self.compute_dtype
        mul, I = self.mul, self.I_dim
        blocks = []
        ofs = 0
        for mi in self.irreps_in:
            d = mi.ir.dim
            b = x[:, ofs: ofs + mul * d].reshape(-1, mul, d)
            blocks.append(jnp.transpose(b, (0, 2, 1)))   # [N, d, mul]
            ofs += mul * d
        return jnp.concatenate(blocks, axis=1).reshape(
            num_nodes, I * mul
        ).astype(cd)

    def _output_blocks(self, acc, num_nodes, extra_io=None):
        """kernel rows (g, dd, io, u) -> component-major per-io blocks
        ``{io: [N, d_io, mul_io]}`` in compute dtype (sc ``extra_io``
        folded in) — the pre-transpose stage of ``_format_output``.

        The kernel-layout (kl) inter-layer handoff consumes these blocks
        directly: the NEXT layer's ``_prep_x_nodes`` table is exactly
        these blocks stacked along the component axis, so emitting them
        (gated in-place, see Gate.apply_kl) instead of formatted columns
        deletes the per-layer (m, d) transpose round trip — format ->
        gate -> prep — from both the forward and its adjoint."""
        extra_io = extra_io or {}
        per_io = {}
        for g, mx in enumerate(self._mix):
            Wg, d = mx["Wg"], mx["d"]
            w_ofs = 0
            for io, mo_mul in zip(mx["ios"], mx["muls"]):
                cols = acc[:, mx["out_row"]: mx["out_row"] + d * Wg]
                blk = cols.reshape(num_nodes, d, Wg)[
                    :, :, w_ofs: w_ofs + mo_mul
                ]                                     # [N, d, mul_out]
                if io in extra_io:
                    blk = blk + extra_io[io].astype(blk.dtype)
                per_io[io] = blk
                w_ofs += mo_mul
        for io, sc_blk in extra_io.items():
            if io not in per_io:  # sc-only outputs
                per_io[io] = sc_blk
        return per_io

    def _format_output(self, acc, num_nodes, extra_io=None,
                       out_dtype=jnp.float32):
        """kernel rows (g, dd, io, u) -> irreps_out columns (io, u, dd) via
        dense slices + one transpose per (group, io) — an elementwise
        jnp.take gather here costs ~20x the bandwidth floor on TPU.
        Formatting stays in compute dtype; the cast to out_dtype happens
        on the final per-io blocks."""
        per_io = self._output_blocks(acc, num_nodes, extra_io)
        outs = []
        for io, mo in enumerate(self.linear.irreps_out):
            if io in per_io:
                blk = per_io[io]                      # [N, d, mul_out]
                outs.append(
                    jnp.transpose(blk, (0, 2, 1)).reshape(
                        num_nodes, mo.mul * mo.ir.dim
                    ).astype(out_dtype)
                )
            else:
                outs.append(
                    jnp.zeros((num_nodes, mo.mul * mo.ir.dim), out_dtype)
                )
        return jnp.concatenate(outs, axis=-1)
