"""Pallas fused pairwise uvu tensor-product expansion (internal weights).

The hamiltonian head (reference e3_layers/nn/output.py:77-164 ``Pairwise``
and e3_layers/nn/pointwise.py:54-100 ``TensorProductExpansion``) evaluates
two internal-weight uvu TP expansions per layer call: diag = tp(f, f) per
node and off = tp(f, conv(Ylm)) per edge.  At l_max=4 / n_dim=64 that is
~260 CG paths; the per-path XLA lowering (``_expand_fused``) is the measured
wall of the hamiltonian workload — hundreds of [M, 64, d<=9] einsums whose
minor dims pad to 128 lanes.

This kernel computes the whole expansion tile-wise in VMEM:

    stage 1 (XLA): per-path weighted right operand (the uvu weight contracts
        the right multiplicity, out[u] = sum_v w[u,v] tp(a[u], b[v]), so the
        kernel sees bw_p[u, j] = sum_v w_p[u, v] b[v, j]) — one matmul per
        right-irrep slot, rows stacked (i2, i1, path, j).
    kernel, per element tile (minor layout (u, e) like the conv kernels):
        outer[(i,p,j), (u,e)] = a[i] * bw[(p,j)]     (VPU, d1 row-broadcast
                                                      multiplies per (i1,i2)
                                                      pair — all 2-D ops)
        mid_s = C2_s @ outer_s                       (one MXU matmul per
                                                      pair-section; C2 is the
                                                      static CG operator with
                                                      path_weight folded in)
        out rows += wselT @ mid-block                (the expansion's mix
                                                      linear, per (group,
                                                      component, section))

The custom VJP recomputes the per-section intermediates tile-wise (remat)
and emits cotangents for aT, bwT and the stacked mix matrices; the stage-1
weighting, the operand transposes and the mix-matrix gather stay in XLA, so
autodiff routes d(bw) back to the TP weights / right features and d(wsel)
back to the TPE linear pytree automatically.

Like the other Pallas kernels this one is first-order only (custom VJP);
callers that differentiate twice must use the XLA expansion.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..wigner import wigner_3j
from .fused_conv import _compiler_params, _use_interpret


def _ceil8(x: int) -> int:
    return -(-x // 8) * 8


class PallasPairwiseTP:
    """Fused lowering for one internal-weight all-uvu TensorProductExpansion.

    Parameter-compatible with ``TensorProductExpansion`` (same pytree);
    forward/gradient parity vs ``tpe.expand`` is covered by tests.
    """

    def __init__(self, tpe, compute_dtype=jnp.bfloat16, tile: int = None):
        assert tpe.internal_weight, "pairwise kernel needs internal weights"
        tp, lin = tpe.tp, tpe.linear
        assert all(
            ins.mode == "uvu" and ins.has_weight for ins in tp.instructions
        ), "pairwise kernel requires all-uvu weighted instructions"
        assert not lin.bias_slots, "mix linear must be bias-free"
        self.tpe = tpe
        self.compute_dtype = compute_dtype
        # Mosaic requires 128 lanes on the bare-T output block; smaller tiles
        # are for interpret-mode tests only.
        self.tile = 128 if tile is None else tile

        irreps_a = tp.irreps_in1
        irreps_b = tp.irreps_in2
        mid_irreps = tp.irreps_out
        self.irreps_a, self.irreps_b = irreps_a, irreps_b
        muls = {mi.mul for mi in irreps_a}
        assert len(muls) == 1, "uniform left multiplicity required"
        self.mul = mul = muls.pop()
        self.I_dim = I = sum(mi.ir.dim for mi in irreps_a)
        self._i_starts = np.cumsum([0] + [mi.ir.dim for mi in irreps_a])

        # ---- flat-weight offsets in TPE instruction order ------------------
        w_off, ofs = {}, 0
        for idx, ins in enumerate(tp.instructions):
            w_off[idx] = ofs
            ofs += int(np.prod(tp._weight_shape(ins)))
        self.weight_numel = ofs

        # ---- paths: mix-reachable only, ordered by output irrep ------------
        self.lin_out: Dict = {}
        for io, mo in enumerate(lin.irreps_out):
            self.lin_out.setdefault(mo.ir, []).append(io)
        usable = [i for i, ins in enumerate(tp.instructions)
                  if mid_irreps[ins.i_out].ir in self.lin_out]
        order = sorted(
            usable,
            key=lambda i: (
                mid_irreps[tp.instructions[i].i_out].ir.l,
                -mid_irreps[tp.instructions[i].i_out].ir.p,
                i,
            ),
        )
        self.paths = [tp.instructions[i] for i in order]
        self.path_w_off = [w_off[i] for i in order]
        # global path index (into self.paths) by original instruction id
        pos_of = {i: q for q, i in enumerate(order)}

        # ---- output-irrep groups (contiguous in path order) ----------------
        groups = []  # (ir, n_paths, d, p0)
        p = 0
        while p < len(self.paths):
            ir = mid_irreps[self.paths[p].i_out].ir
            q = p
            while (q < len(self.paths)
                   and mid_irreps[self.paths[q].i_out].ir == ir):
                q += 1
            groups.append((ir, q - p, ir.dim, p))
            p = q
        self.groups = groups

        # ---- mix bookkeeping: simplified-linear row rank per path ----------
        simplified = mid_irreps.simplify()
        self.linear = lin
        slot_rank, counter = {}, {}
        for slot, mi in enumerate(mid_irreps):
            slot_rank[slot] = counter.get(mi.ir, 0)
            counter[mi.ir] = slot_rank[slot] + mi.mul
        self.lin_in_index = {mi.ir: ii for ii, mi in enumerate(simplified)}

        # ---- bw row layout + pair sections ---------------------------------
        # bw rows are ordered (i2 slot, i1 slot, path, j-component); one
        # section per (i1, i2) pair so the CG matmul is block-diag only over
        # the pair's few paths (L ~ 2-5: ~2.6x the sparse-optimal MACs).
        by_slot: Dict[int, List[int]] = {}
        for q, ins in enumerate(self.paths):
            by_slot.setdefault(ins.i_in2, []).append(q)
        self._slot_paths = {
            i2: sorted(qs, key=lambda q: (self.paths[q].i_in1,
                                          mid_irreps[self.paths[q].i_out].ir.l))
            for i2, qs in by_slot.items()
        }
        self._slot_order = sorted(self._slot_paths)

        self._secs = []   # per section metadata
        self.R = 0        # total bw rows
        k2 = 0            # stacked mid rows across sections (K8-padded)
        bw_row = 0
        for i2 in self._slot_order:
            qs = self._slot_paths[i2]
            d2 = irreps_b[i2].ir.dim
            s = 0
            while s < len(qs):
                i1 = self.paths[qs[s]].i_in1
                e = s
                while e < len(qs) and self.paths[qs[e]].i_in1 == i1:
                    e += 1
                plist = qs[s:e]
                d1 = irreps_a[i1].ir.dim
                # per-group path sublists (ascending group id)
                gq: Dict[int, List[int]] = {}
                for q in plist:
                    ir3 = mid_irreps[self.paths[q].i_out].ir
                    g = next(gi for gi, (gir, _, _, _) in enumerate(groups)
                             if gir == ir3)
                    gq.setdefault(g, []).append(q)
                rows = len(plist) * d2 * d1
                used = sum(len(v) * groups[g][2] for g, v in gq.items())
                K8 = _ceil8(used)
                self._secs.append(dict(
                    i1=i1, i2=i2, d1=d1, d2=d2, plist=plist, gq=gq,
                    rows=rows, used=used, K8=K8, k0=k2, bw0=bw_row,
                    i0=int(self._i_starts[i1]),
                ))
                k2 += K8
                bw_row += len(plist) * d2
                s = e
        self.K2 = k2
        self.R = bw_row

        # per-section C2 operator [K8, rows]: rows ordered (g asc, dd, m),
        # cols ordered (path q-local, j, i); cg scaled by path_weight.
        self._C2s, self._C2Ts = [], []
        for sm in self._secs:
            C = np.zeros((sm["K8"], sm["rows"]), np.float32)
            d1, d2 = sm["d1"], sm["d2"]
            qcol = {q: qi for qi, q in enumerate(sm["plist"])}
            k = 0
            for g in sorted(sm["gq"]):
                d3 = groups[g][2]
                for m, q in enumerate(sm["gq"][g]):
                    ins = self.paths[q]
                    l1 = irreps_a[ins.i_in1].ir.l
                    l2 = irreps_b[ins.i_in2].ir.l
                    l3 = mid_irreps[ins.i_out].ir.l
                    cg = wigner_3j(l1, l2, l3) * ins.path_weight  # [d1,d2,d3]
                    npg = len(sm["gq"][g])
                    L = len(sm["plist"])
                    for dd in range(d3):
                        row = k + dd * npg + m
                        for j in range(d2):
                            for i in range(d1):
                                # outer rows are i-major: (i, path q, j) —
                                # the kernel builds them as d1 2-D
                                # row-broadcast multiplies (no rank-3 ops)
                                col = i * (L * d2) + qcol[q] * d2 + j
                                C[row, col] += cg[i, j, dd]
                k += len(sm["gq"][g]) * d3
            self._C2s.append(C)
            self._C2Ts.append(np.ascontiguousarray(C.T))
        # stacked, padded operator tensors (Pallas kernels take them as one
        # input ref each; per-section slices are static)
        self.K8max = max(C.shape[0] for C in self._C2s)
        self.rows_max = -(-max(C.shape[1] for C in self._C2s) // 128) * 128
        S = len(self._secs)
        C2all = np.zeros((S, self.K8max, self.rows_max), np.float32)
        C2Tall = np.zeros((S, self.rows_max, self.K8max), np.float32)
        for si, C in enumerate(self._C2s):
            C2all[si, : C.shape[0], : C.shape[1]] = C
            C2Tall[si, : C.shape[1], : C.shape[0]] = self._C2Ts[si]
        self._C2all = jnp.asarray(C2all)
        self._C2Tall = jnp.asarray(C2Tall)

        # ---- mix layout: stacked wsel + per-(group, dd) output rows --------
        # out rows ordered (group, dd, io-concat, u); wsel matrices stacked
        # into ONE [sum npg*mul, Wmax] array (cols zero-padded to Wmax).
        self._mix = []
        out_row = 0
        for g, (ir, n_paths, d, p0) in enumerate(groups):
            ios = self.lin_out.get(ir, [])
            muls_o = [lin.irreps_out[io].mul for io in ios]
            self._mix.append(dict(d=d, ios=ios, muls=muls_o,
                                  Wg=sum(muls_o), out_row=out_row, secs=[]))
            out_row += d * sum(muls_o)
        self.out_rows = out_row
        self.Wmax = max(mx["Wg"] for mx in self._mix)

        # section-local mid-row offsets per (section, group)
        k0_sg = {}
        for si, sm in enumerate(self._secs):
            k = sm["k0"]
            for g in sorted(sm["gq"]):
                k0_sg[(si, g)] = k
                k += len(sm["gq"][g]) * groups[g][2]

        # stacked-wsel layout is GROUP-major: each group's mix matrix is one
        # contiguous [gcols, Wg] slice (its sections' (path, u) rows stacked
        # in section order), so the whole group mixes in ONE MXU dot per
        # kernel stage instead of one tiny dot per (section, component)
        wcol = 0
        self._wsel_meta = []
        for g, (ir, n_paths, d, p0) in enumerate(groups):
            gofs = 0
            for si, sm in enumerate(self._secs):
                if g not in sm["gq"]:
                    continue
                plist_g = sm["gq"][g]
                npg = len(plist_g)
                # rows of the simplified linear input for (path m, u)
                perm = np.concatenate([
                    np.arange(slot_rank[self.paths[q].i_out],
                              slot_rank[self.paths[q].i_out] + mul)
                    for q in plist_g
                ])
                ent = dict(si=si, g=g, k0=k0_sg[(si, g)], npg=npg,
                           gofs=gofs, perm=jnp.asarray(perm))
                self._mix[g]["secs"].append(ent)
                self._wsel_meta.append(ent)
                gofs += npg * mul
            self._mix[g]["col0"] = wcol
            self._mix[g]["gcols"] = gofs
            wcol += gofs
        self.wsel_cols = wcol  # == n_usable_paths * mul

        # ---- final column permutation: out[:, (io, u, dd)] <- kernel row ---
        out_dim = sum(mo.mul * mo.ir.dim for mo in lin.irreps_out)
        io_offsets = np.cumsum(
            [0] + [mo.mul * mo.ir.dim for mo in lin.irreps_out]
        )
        col_src = np.full(out_dim, -1, np.int64)
        for g, (ir, n_paths, d, p0) in enumerate(groups):
            mx = self._mix[g]
            for dd in range(d):
                w_ofs = 0
                for io, mo_mul in zip(mx["ios"], mx["muls"]):
                    base = mx["out_row"] + dd * mx["Wg"] + w_ofs
                    for u in range(mo_mul):
                        col_src[io_offsets[io] + u * d + dd] = base + u
                    w_ofs += mo_mul
        self.out_dim = out_dim
        col_src[col_src < 0] = out_row  # zero pad row
        self._col_src = jnp.asarray(col_src)

    # ------------------------------------------------------------------ prep
    def _prep_feat(self, x, Mp):
        """[M, in_dim] -> [I, Mp*mul] with per-tile minor layout (u, e)."""
        mul, I, T = self.mul, self.I_dim, self.tile
        cd = self.compute_dtype
        M = x.shape[0]
        if M < Mp:
            x = jnp.concatenate(
                [x, jnp.zeros((Mp - M, x.shape[1]), x.dtype)], axis=0
            )
        blocks = []
        ofs = 0
        for mi in self.irreps_a:
            d = mi.ir.dim
            b = x[:, ofs: ofs + mul * d].reshape(Mp, mul, d)
            blocks.append(jnp.transpose(b, (2, 1, 0)))  # [d, mul, Mp]
            ofs += mul * d
        xT = jnp.concatenate(blocks, axis=0).astype(cd)  # [I, mul, Mp]
        xT = xT.reshape(I, mul, Mp // T, T).transpose(0, 2, 1, 3)
        return xT.reshape(I, Mp * mul)

    def _prep_bw(self, weight, b, Mp):
        """Stage 1: per-path weighted right operand.

        bw_p[u, j] = sum_v w_p[u, v] * b[v, j] — one matmul per right-irrep
        slot (paths stacked), rows ordered (i2, i1, path, j) to match the
        kernel's section layout -> [R, Mp*mul]."""
        mul, T = self.mul, self.tile
        cd = self.compute_dtype
        M = b.shape[0]
        if M < Mp:
            b = jnp.concatenate(
                [b, jnp.zeros((Mp - M, b.shape[1]), b.dtype)], axis=0
            )
        slices_b = self.irreps_b.slices()
        pieces = []
        for i2 in self._slot_order:
            qs = self._slot_paths[i2]
            mi2 = self.irreps_b[i2]
            mul2, d2 = mi2.mul, mi2.ir.dim
            W = jnp.stack([
                weight[self.path_w_off[q]:
                       self.path_w_off[q] + mul * mul2].reshape(mul, mul2)
                for q in qs
            ])                                           # [P, u, v]
            bs = b[:, slices_b[i2]].reshape(Mp, mul2, d2)
            # [P, d2, u, Mp]
            bw = jnp.einsum("mvj,puv->pjum", bs.astype(cd), W.astype(cd))
            pieces.append(bw.reshape(len(qs) * d2, mul, Mp))
        bwT = jnp.concatenate(pieces, axis=0).astype(cd)  # [R, mul, Mp]
        bwT = bwT.reshape(self.R, mul, Mp // T, T).transpose(0, 2, 1, 3)
        return bwT.reshape(self.R, Mp * mul)

    def _prep_wsel(self, linear_params):
        """Stacked mix matrices: wsel_all [wsel_cols, Wmax] (rows (g,sec,m,u)
        order) and its transpose; gradients flow back to the TPE linear
        pytree through this gather."""
        cd = self.compute_dtype
        rows = []
        for ent in self._wsel_meta:
            g = ent["g"]
            mx = self._mix[g]
            ir = self.groups[g][0]
            ii = self.lin_in_index[ir]
            cols = []
            for io in mx["ios"]:
                w_full = (linear_params[f"w{ii}_{io}"]
                          * self.linear.alphas[io])
                cols.append(w_full[ent["perm"]])
            blk = jnp.concatenate(cols, axis=1)          # [npg*mul, Wg]
            if blk.shape[1] < self.Wmax:
                blk = jnp.concatenate([
                    blk,
                    jnp.zeros((blk.shape[0], self.Wmax - blk.shape[1]),
                              blk.dtype),
                ], axis=1)
            rows.append(blk)
        wsel_all = jnp.concatenate(rows, axis=0).astype(cd)
        return wsel_all.T, wsel_all

    # --------------------------------------------------------------- kernels
    @functools.cached_property
    def _sec_ents(self) -> Dict[int, List[dict]]:
        """Mix entries grouped by section, in ``sorted(sm["gq"])`` group
        order (the C2 row order)."""
        out: Dict[int, List[dict]] = {si: [] for si in range(len(self._secs))}
        for ent in self._wsel_meta:
            out[ent["si"]].append(ent)
        for si in out:
            out[si].sort(key=lambda e: e["g"])
        return out

    def _mid_of(self, a, bw, C2, si):
        """Per-section TP intermediate [K8*mul, T] from in-VMEM operands.
        ``C2`` is the loaded stacked operator [S, K8max, rows_max]."""
        mul, T = self.mul, self.tile
        cd = self.compute_dtype
        sm = self._secs[si]
        d1, d2 = sm["d1"], sm["d2"]
        L = len(sm["plist"])
        bw_blk = bw[sm["bw0"]: sm["bw0"] + L * d2, :]    # [L*d2, mul*T]
        outer = jnp.concatenate([
            a[sm["i0"] + i: sm["i0"] + i + 1, :] * bw_blk
            for i in range(d1)
        ], axis=0)                                       # [(i,q,j), mul*T]
        C = C2[si, : sm["K8"], : sm["rows"]]
        mid = jax.lax.dot_general(
            C.astype(cd), outer,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)                                     # [K8, mul*T]
        return mid.reshape(sm["K8"] * mul, T)

    def _fwd_kernel(self):
        mul, T = self.mul, self.tile
        cd = self.compute_dtype
        mix = self._mix

        def kernel(aT, bwT, wselT_all, C2all, out):
            a = aT[...]
            bw = bwT[...]
            wT = wselT_all[...]
            C2 = C2all[...]
            # Stream sections: each section's TP intermediate is consumed
            # into per-group f32 accumulators immediately (the mix dot is
            # linear in its row blocks), so only ONE section's mid is live
            # at a time.  Materializing all mids first (~52MB at the
            # hamiltonian head size) spills registers past the VMEM budget.
            o_acc = [jnp.zeros((mx["Wg"], mx["d"] * T), jnp.float32)
                     for mx in mix]
            for si in range(len(self._secs)):
                mid = self._mid_of(a, bw, C2, si)
                sm = self._secs[si]
                for ent in self._sec_ents[si]:
                    g = ent["g"]
                    mx = mix[g]
                    blk = self._ent_block(mid, ent, sm, mx["d"])
                    wt = wT[:mx["Wg"],
                            mx["col0"] + ent["gofs"]:
                            mx["col0"] + ent["gofs"] + ent["npg"] * mul]
                    o_acc[g] = o_acc[g] + jax.lax.dot_general(
                        wt, blk,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # [Wg, d*T]
            outs = []
            for g, mx in enumerate(mix):
                o = o_acc[g].astype(cd)
                outs.extend(o[:, dd * T: (dd + 1) * T]
                            for dd in range(mx["d"]))
            out[...] = jnp.concatenate(outs, axis=0)

        return kernel

    def _ent_block(self, mid, ent, sm, d):
        """One mix entry's rows of a section mid: per-component [npg*mul, T]
        slices, lane-concat over dd -> [npg*mul, d*T].  All slices are
        mul-aligned (free register stacking)."""
        mul = self.mul
        cols = []
        for dd in range(d):
            r0 = (ent["k0"] - sm["k0"] + dd * ent["npg"]) * mul
            cols.append(mid[r0: r0 + ent["npg"] * mul, :])
        return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)

    def _go_lanes(self, go, mx):
        """Group's output-cotangent rows, lane-stacked: [Wg, d*T]."""
        T = self.tile
        Wg = mx["Wg"]
        cols = [go[mx["out_row"] + dd * Wg: mx["out_row"] + (dd + 1) * Wg, :]
                for dd in range(mx["d"])]
        return cols[0] if len(cols) == 1 else jnp.concatenate(cols, axis=1)

    def _douter_of(self, ws, go_l, C2T, si):
        """Per-section outer cotangent, built WITHOUT the all-sections
        mix-backward parts table: each of the section's mix entries runs its
        own small dot (wsel_ent @ go_lanes_g), the per-(g, dd) blocks are
        assembled into dmid in local-k order, then the adjoint CG matmul.
        Keeps only one section's intermediates live (VMEM budget)."""
        mul, T = self.mul, self.tile
        cd = self.compute_dtype
        sm = self._secs[si]
        blocks = []
        for ent in self._sec_ents[si]:
            g = ent["g"]
            mx = self._mix[g]
            wt = ws[mx["col0"] + ent["gofs"]:
                    mx["col0"] + ent["gofs"] + ent["npg"] * mul, : mx["Wg"]]
            dfull = jax.lax.dot_general(
                wt, go_l[g],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)                                 # [npg*mul, d*T]
            for dd in range(mx["d"]):
                blocks.append(dfull[:, dd * T: (dd + 1) * T])
        dmid = jnp.concatenate(blocks, axis=0)
        if sm["K8"] > sm["used"]:
            dmid = jnp.concatenate([
                dmid, jnp.zeros(((sm["K8"] - sm["used"]) * mul, T), cd),
            ], axis=0)
        dmid = dmid.reshape(sm["K8"], mul * T)
        return jax.lax.dot_general(
            C2T[si, : sm["rows"], : sm["K8"]].astype(cd), dmid,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cd)                                     # [(i,q,j), mul*T]

    def _bwd_kernel_dws(self):
        """Pass 1: the stacked-wsel cotangent — one dot per group
        (blk_g [gcols, d*T] @ go_lanes^T), accumulated across tiles."""
        import jax.experimental.pallas as pl

        def kernel(aT, bwT, wsel_all, C2all, gout, dwsel_ref):
            a = aT[...]
            bw = bwT[...]
            C2 = C2all[...]
            go = gout[...].astype(self.compute_dtype)
            go_l = [self._go_lanes(go, mx) for mx in self._mix]
            # stream sections (see _fwd_kernel): per-entry dws blocks are
            # [npg*mul, Wg] dots of the section's mid rows against the
            # group's go lanes; only one mid is live at a time
            # keyed by the stable (section, group) pair — unique per entry
            # by construction (one ent per (si, g) in _wsel_meta) and robust
            # to _sec_ents/_wsel_meta ever holding copies of the dicts
            dws_ent: Dict[tuple, jnp.ndarray] = {}
            for si in range(len(self._secs)):
                mid = self._mid_of(a, bw, C2, si)
                sm = self._secs[si]
                for ent in self._sec_ents[si]:
                    mx = self._mix[ent["g"]]
                    blk = self._ent_block(mid, ent, sm, mx["d"])
                    dws = jax.lax.dot_general(
                        blk, go_l[ent["g"]],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # [npg*mul, Wg]
                    if mx["Wg"] < self.Wmax:
                        dws = jnp.concatenate([
                            dws,
                            jnp.zeros((dws.shape[0], self.Wmax - mx["Wg"]),
                                      jnp.float32),
                        ], axis=1)
                    dws_ent[(ent["si"], ent["g"])] = dws
            # assemble in the stacked-wsel row order (group-major)
            dws_all = jnp.concatenate(
                [dws_ent[(ent["si"], ent["g"])] for ent in self._wsel_meta], axis=0
            )
            first_tile = pl.program_id(0) == 0

            @pl.when(first_tile)
            def _():
                dwsel_ref[...] = dws_all

            @pl.when(jnp.logical_not(first_tile))
            def _():
                dwsel_ref[...] = dwsel_ref[...] + dws_all

        return kernel

    def _bwd_kernel_da(self):
        """Pass 2: daT — mix backward (per-group dots), per-section adjoint
        CG, i-major row reductions against bwT."""
        mul, T = self.mul, self.tile

        def kernel(bwT, wsel_all, C2Tall, gout, daT):
            bw = bwT[...]
            ws = wsel_all[...]
            C2T = C2Tall[...]
            go = gout[...].astype(self.compute_dtype)
            go_l = [self._go_lanes(go, mx) for mx in self._mix]
            da_acc: Dict = {}                            # i1 slot -> [d1, X]
            for si, sm in enumerate(self._secs):
                d1, d2 = sm["d1"], sm["d2"]
                L = len(sm["plist"])
                douter = self._douter_of(ws, go_l, C2T, si)  # [(i,q,j), X]
                bw_blk = bw[sm["bw0"]: sm["bw0"] + L * d2, :]
                contrib = jnp.concatenate([
                    jnp.sum(douter[i * L * d2: (i + 1) * L * d2, :] * bw_blk,
                            axis=0, keepdims=True)
                    for i in range(d1)
                ], axis=0)                               # [d1, X]
                i1 = sm["i1"]
                da_acc[i1] = (contrib if i1 not in da_acc
                              else da_acc[i1] + contrib)
            da_rows = []
            for i1 in range(len(self.irreps_a)):
                d1 = self.irreps_a[i1].ir.dim
                da_rows.append(da_acc.get(
                    i1, jnp.zeros((d1, mul * T), jnp.float32)
                ))
            daT[...] = jnp.concatenate(da_rows, axis=0).astype(daT.dtype)

        return kernel

    def _bwd_kernel_dbw(self):
        """Pass 3: dbwT — needs aT but never bwT, so the two big per-tile
        operands (bwT in / dbwT out) never share a pass and every pass
        stays within the scoped-VMEM budget at the hamiltonian head's
        full size."""
        mul, T = self.mul, self.tile

        def kernel(aT, wsel_all, C2Tall, gout, dbwT):
            a = aT[...]
            ws = wsel_all[...]
            C2T = C2Tall[...]
            go = gout[...].astype(self.compute_dtype)
            go_l = [self._go_lanes(go, mx) for mx in self._mix]
            blocks = []  # sections enumerate bw rows contiguously in order
            for si, sm in enumerate(self._secs):
                d1, d2 = sm["d1"], sm["d2"]
                L = len(sm["plist"])
                douter = self._douter_of(ws, go_l, C2T, si)  # [(i,q,j), X]
                dbw = None
                for i in range(d1):
                    t = (douter[i * L * d2: (i + 1) * L * d2, :]
                         * a[sm["i0"] + i: sm["i0"] + i + 1, :])
                    dbw = t if dbw is None else dbw + t
                blocks.append(dbw)
            dbwT[...] = jnp.concatenate(blocks, axis=0).astype(dbwT.dtype)

        return kernel

    # -------------------------------------------------------------- pallas op
    @functools.cached_property
    def _pallas_fn(self):
        import jax.experimental.pallas as pl

        mul, T, I, R = self.mul, self.tile, self.I_dim, self.R
        cd = self.compute_dtype
        out_rows = self.out_rows
        fwd_kernel = self._fwd_kernel()
        bwd_kernel_dws = self._bwd_kernel_dws()
        bwd_kernel_da = self._bwd_kernel_da()
        bwd_kernel_dbw = self._bwd_kernel_dbw()
        interpret = _use_interpret()

        def run_fwd(aT, bwT, wselT_all):
            Mp = aT.shape[1] // mul
            grid = (Mp // T,)
            in_specs = [
                pl.BlockSpec((I, T * mul), lambda t: (0, t)),
                pl.BlockSpec((R, T * mul), lambda t: (0, t)),
                pl.BlockSpec(wselT_all.shape, lambda t: (0, 0)),
                pl.BlockSpec(self._C2all.shape, lambda t: (0, 0, 0)),
            ]
            return pl.pallas_call(
                fwd_kernel,
                grid=grid,
                in_specs=in_specs,
                out_specs=pl.BlockSpec((out_rows, T), lambda t: (0, t)),
                out_shape=jax.ShapeDtypeStruct((out_rows, Mp), cd),
                interpret=interpret,
                **_compiler_params(interpret),
            )(aT, bwT, wselT_all, self._C2all)

        def run_bwd(aT, bwT, wsel_all, gout):
            Mp = aT.shape[1] // mul
            grid = (Mp // T,)
            dwsel = pl.pallas_call(
                bwd_kernel_dws,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((I, T * mul), lambda t: (0, t)),
                    pl.BlockSpec((R, T * mul), lambda t: (0, t)),
                    pl.BlockSpec(wsel_all.shape, lambda t: (0, 0)),
                    pl.BlockSpec(self._C2all.shape, lambda t: (0, 0, 0)),
                    pl.BlockSpec((out_rows, T), lambda t: (0, t)),
                ],
                out_specs=pl.BlockSpec(wsel_all.shape, lambda t: (0, 0)),
                out_shape=jax.ShapeDtypeStruct(wsel_all.shape, jnp.float32),
                interpret=interpret,
                **_compiler_params(interpret),
            )(aT, bwT, wsel_all, self._C2all, gout)
            daT = pl.pallas_call(
                bwd_kernel_da,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((R, T * mul), lambda t: (0, t)),
                    pl.BlockSpec(wsel_all.shape, lambda t: (0, 0)),
                    pl.BlockSpec(self._C2Tall.shape, lambda t: (0, 0, 0)),
                    pl.BlockSpec((out_rows, T), lambda t: (0, t)),
                ],
                out_specs=pl.BlockSpec((I, T * mul), lambda t: (0, t)),
                out_shape=jax.ShapeDtypeStruct((I, Mp * mul), cd),
                interpret=interpret,
                **_compiler_params(interpret),
            )(bwT, wsel_all, self._C2Tall, gout)
            dbwT = pl.pallas_call(
                bwd_kernel_dbw,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((I, T * mul), lambda t: (0, t)),
                    pl.BlockSpec(wsel_all.shape, lambda t: (0, 0)),
                    pl.BlockSpec(self._C2Tall.shape, lambda t: (0, 0, 0)),
                    pl.BlockSpec((out_rows, T), lambda t: (0, t)),
                ],
                out_specs=pl.BlockSpec((R, T * mul), lambda t: (0, t)),
                out_shape=jax.ShapeDtypeStruct((R, Mp * mul), cd),
                interpret=interpret,
                **_compiler_params(interpret),
            )(aT, wsel_all, self._C2Tall, gout)
            return daT, dbwT, dwsel

        @jax.custom_vjp
        def f(aT, bwT, wselT_all, wsel_all):
            return run_fwd(aT, bwT, wselT_all)

        def f_fwd(aT, bwT, wselT_all, wsel_all):
            return run_fwd(aT, bwT, wselT_all), (aT, bwT, wsel_all)

        def f_bwd(res, gout):
            aT, bwT, wsel_all = res
            daT, dbwT, dwsel = run_bwd(aT, bwT, wsel_all, gout)
            # the mix gradient is returned on the untransposed leg; both
            # legs derive from the same params upstream, XLA sums the paths
            return (daT, dbwT,
                    jnp.zeros((wsel_all.shape[1], wsel_all.shape[0]),
                              wsel_all.dtype),
                    dwsel.astype(wsel_all.dtype))

        f.defvjp(f_fwd, f_bwd)
        return f

    # -------------------------------------------------------------- interface
    def __call__(self, params, left, right, out_dtype=jnp.float32):
        """params: TPE pytree ({"tp": {"weight"}, "linear": {...}});
        left [M, dim_a], right [M, dim_b] -> [M, out_dim]."""
        T = self.tile
        M = left.shape[0]
        Mp = -(-M // T) * T
        aT = self._prep_feat(left, Mp)
        bwT = self._prep_bw(params["tp"]["weight"], right, Mp)
        wselT_all, wsel_all = self._prep_wsel(params["linear"])
        outT = self._pallas_fn(aT, bwT, wselT_all, wsel_all)
        outT = jnp.concatenate(
            [outT, jnp.zeros((1, Mp), outT.dtype)], axis=0
        )
        out = jnp.take(outT, self._col_src, axis=0).T
        return out[:M].astype(out_dtype)
