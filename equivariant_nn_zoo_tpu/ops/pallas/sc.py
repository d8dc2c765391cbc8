"""Species-table self-connection kernel.

The NequIP self-connection is a FullyConnectedTensorProduct of the node
features with the node attributes (reference: e3_layers/nn/message_passing.py
``sc``).  When the attributes are a pure per-species embedding (the
``featureModel`` builder's embedCategorial guarantees this), the per-node
conditioning matrix ``A[n] = attrs[n] @ W`` takes at most ``num_types``
distinct values — so instead of materializing ``A`` per node
([N, mul, mul_out] per slot, the HBM wall of the XLA fast path in
ops/fused_tp.py:265), compute the tiny per-type tables in XLA and run
``num_types`` dense MXU matmuls per node tile in VMEM, masked by species:

    out_l[n] = sum_t [species_n == t] * (x_l[n] @ A_l[t])

Slots are PAIRED by equal irrep dim (the e/o partner of each degree in the
standard feature layout) into one block-diagonal dot per pair:
``[x_a | x_b] @ [[A_a, 0], [0, A_b]]`` — the single-slot dot is
[rows, 64] x [64, 64] (quarter MXU occupancy: half-width contraction AND
half-width lanes); the paired dot is [rows, 128] x [128, 128] (full
occupancy), so the paired kernel retires the same work in half the passes.
The zero blocks double nominal MACs but ride for free in the same systolic
passes.

Gradients: the per-type representative attrs row receives the summed
cotangent of every node of that type, which is exactly the embedding-row
gradient (all nodes of a type share the same embedding row), so end-to-end
parameter gradients are identical to the per-node formulation.

Each pair is fed as a row-expanded [(N*d_l), M1] array prepared in
XLA (node-sized relayouts; Mosaic's shape-cast support doesn't cover the
odd-d minor splits in-kernel), so the kernel body is pure matmul+mask.

Parameter-compatible with ``ops.tensor_product.fully_connected_tp`` (same
``weight`` vector).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .fused_conv import _compiler_params, _use_interpret


class SpeciesScalarFCTP:
    """Drop-in for FusedScalarFCTP when node_attrs is species-determined."""

    def __init__(self, tp, num_types: int, compute_dtype=jnp.bfloat16,
                 tile: int = 128):
        self.compute_dtype = compute_dtype
        self.tp = tp
        self.num_types = int(num_types)
        self.tile = tile
        ir1, ir2 = tp.irreps_in1, tp.irreps_in2
        assert all(mi.ir.l == 0 and mi.ir.p == 1 for mi in ir2), "scalars only"
        self.mul2 = sum(mi.mul for mi in ir2)
        self.items = []
        w_ofs = 0
        x_ofs = 0
        x_offsets = {}
        for i1, mi in enumerate(ir1):
            x_offsets[i1] = x_ofs
            x_ofs += mi.mul * mi.ir.dim
        self.in_dim = x_ofs
        # kernel-layout input eligibility: row = col // mul needs one
        # uniform multiplicity across irreps_in1 (the feature irreps)
        self._kl_ok = len({mi.mul for mi in ir1}) == 1
        for ins in tp.instructions:
            shape = tp._weight_shape(ins)  # (mul1, mul2, mul_out)
            n = int(np.prod(shape))
            d = ir1[ins.i_in1].ir.dim
            self.items.append(dict(
                ins=ins, w_ofs=w_ofs, shape=shape, d=d,
                x_ofs=x_offsets[ins.i_in1],
            ))
            w_ofs += n

        # pair plan: greedily fuse two equal-d slots (the e/o partners in
        # the standard layout) while the stacked contraction fits one MXU
        # tile; leftovers run solo.  ``idxs`` preserves item order so the
        # column split in apply_raw is a static slice.
        by_d: dict = {}
        for idx, it in enumerate(self.items):
            by_d.setdefault(it["d"], []).append(idx)
        self._groups = []
        for d in sorted(by_d):
            idxs = by_d[d]
            i = 0
            while i < len(idxs):
                pick = [idxs[i]]
                if (i + 1 < len(idxs)
                        and self.items[idxs[i]]["shape"][0]
                        + self.items[idxs[i + 1]]["shape"][0] <= 128):
                    pick.append(idxs[i + 1])
                i += len(pick)
                self._groups.append(dict(
                    idxs=pick, d=d,
                    M1=sum(self.items[j]["shape"][0] for j in pick),
                    O=sum(self.items[j]["shape"][2] for j in pick),
                ))

    # ------------------------------------------------------------------ XLA
    def _tables(self, params, attrs, species):
        """Per-group per-type block-diagonal tables [types*M1, O]."""
        cd = self.compute_dtype
        weight = params["weight"]
        spec = species.reshape(-1).astype(jnp.int32)
        rep = jnp.zeros((self.num_types, self.mul2), attrs.dtype)
        rep = rep.at[spec].set(attrs)
        per_item = []
        for it in self.items:
            mul1, mul2, mul_out = it["shape"]
            w = (weight[it["w_ofs"]: it["w_ofs"] + mul1 * mul2 * mul_out]
                 .reshape(mul1, mul2, mul_out)
                 * (it["ins"].path_weight / np.sqrt(it["d"])))
            A = jax.lax.dot_general(
                rep.astype(cd), w.astype(cd),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(cd)  # [types, mul1, mul_out]
            per_item.append(A)
        tables = []
        for grp in self._groups:
            if len(grp["idxs"]) == 1:
                A = per_item[grp["idxs"][0]]
                tables.append(A.reshape(self.num_types * grp["M1"], grp["O"]))
                continue
            ia, ib = grp["idxs"]
            Aa, Ab = per_item[ia], per_item[ib]
            m1a, _, oa = self.items[ia]["shape"]
            m1b, _, ob = self.items[ib]["shape"]
            top = jnp.concatenate(
                [Aa, jnp.zeros((self.num_types, m1a, ob), Aa.dtype)], axis=2
            )
            bot = jnp.concatenate(
                [jnp.zeros((self.num_types, m1b, oa), Ab.dtype), Ab], axis=2
            )
            A = jnp.concatenate([top, bot], axis=1)  # [types, M1, O]
            tables.append(A.reshape(self.num_types * grp["M1"], grp["O"]))
        return tables

    def _prep_x(self, x, x_is_table=False):
        """x [N, in_dim] -> per-group row-expanded blocks [(N*d), M1].

        ``x_is_table``: x is already the kernel-layout node table
        [N, I*mul] (fused_conv._prep_x_nodes layout, uniform mul) — the
        per-item block is a ROW slice there, no (mul, d) transpose.
        Requires uniform input multiplicity (row = col // mul)."""
        N = x.shape[0]
        if x_is_table:
            mul = self.tp.irreps_in1[0].mul
            t = x.reshape(N, -1, mul)
        blocks = []
        for grp in self._groups:
            cols = []
            for j in grp["idxs"]:
                it = self.items[j]
                mul1, _, _ = it["shape"]
                d = it["d"]
                if x_is_table:
                    r0 = it["x_ofs"] // mul1
                    cols.append(
                        t[:, r0: r0 + d, :].reshape(N * d, mul1)
                        .astype(self.compute_dtype)
                    )
                    continue
                b = x[:, it["x_ofs"]: it["x_ofs"] + mul1 * d]
                cols.append(
                    jnp.transpose(b.reshape(N, mul1, d), (0, 2, 1)).reshape(
                        N * d, mul1
                    ).astype(self.compute_dtype)
                )
            blocks.append(
                cols[0] if len(cols) == 1
                else jnp.concatenate(cols, axis=1)
            )
        return blocks

    # -------------------------------------------------------------- kernels
    def _fwd_kernel(self):
        groups, types = self._groups, self.num_types
        L = len(groups)

        def kernel(*args):
            x_refs = args[:L]
            spec_refs = args[L: 2 * L]
            A_refs = args[2 * L: 3 * L]
            out_refs = args[3 * L:]
            for li, grp in enumerate(groups):
                M1 = grp["M1"]
                xb = x_refs[li][...]          # [(Tn*d), M1]
                spec = spec_refs[li][...]     # [(Tn*d), 1]
                A = A_refs[li][...]
                acc = None
                for t in range(types):
                    res = jax.lax.dot_general(
                        xb, A[t * M1: (t + 1) * M1, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    m = (spec == t).astype(jnp.float32)
                    acc = m * res if acc is None else acc + m * res
                out_refs[li][...] = acc.astype(out_refs[li].dtype)

        return kernel

    def _bwd_kernel(self):
        import jax.experimental.pallas as pl

        groups, types = self._groups, self.num_types
        cd = self.compute_dtype
        L = len(groups)

        def kernel(*args):
            x_refs = args[:L]
            spec_refs = args[L: 2 * L]
            A_refs = args[2 * L: 3 * L]
            g_refs = args[3 * L: 4 * L]
            dx_refs = args[4 * L: 5 * L]
            dA_refs = args[5 * L: 6 * L]
            first = pl.program_id(0) == 0
            for li, grp in enumerate(groups):
                M1 = grp["M1"]
                xb = x_refs[li][...]
                spec = spec_refs[li][...]
                A = A_refs[li][...]
                g = g_refs[li][...].astype(cd)
                dA_acc = []
                dx_acc = None
                for t in range(types):
                    m = (spec == t).astype(cd)
                    gm = (m * g).astype(cd)
                    dx_t = jax.lax.dot_general(
                        gm, A[t * M1: (t + 1) * M1, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    dx_acc = dx_t if dx_acc is None else dx_acc + dx_t
                    dA_acc.append(
                        jax.lax.dot_general(
                            xb, gm,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    )
                dx_refs[li][...] = dx_acc.astype(dx_refs[li].dtype)
                dA = jnp.concatenate(dA_acc, axis=0)

                @pl.when(first)
                def _(li=li, dA=dA):
                    dA_refs[li][...] = dA

                @pl.when(jnp.logical_not(first))
                def _(li=li, dA=dA):
                    dA_refs[li][...] = dA_refs[li][...] + dA

        return kernel

    # ------------------------------------------------------------ pallas op
    def _make_fn(self, N, specs):
        import jax.experimental.pallas as pl

        groups, Tn = self._groups, self.tile
        cd = self.compute_dtype
        fwd_kernel = self._fwd_kernel()
        bwd_kernel = self._bwd_kernel()
        interpret = _use_interpret()
        grid = (N // Tn,)

        def xspec():
            return [
                pl.BlockSpec((Tn * grp["d"], grp["M1"]),
                             lambda t: (t, 0))
                for grp in groups
            ]

        def sspec():
            return [
                pl.BlockSpec((Tn * grp["d"], 1), lambda t: (t, 0))
                for grp in groups
            ]

        def ospec():
            return [
                pl.BlockSpec((Tn * grp["d"], grp["O"]),
                             lambda t: (t, 0))
                for grp in groups
            ]

        def aspec():
            return [
                pl.BlockSpec(
                    (self.num_types * grp["M1"], grp["O"]),
                    lambda t: (0, 0),
                )
                for grp in groups
            ]

        def run_fwd(xs, tables):
            return pl.pallas_call(
                fwd_kernel,
                grid=grid,
                in_specs=xspec() + sspec() + aspec(),
                out_specs=ospec(),
                out_shape=[
                    jax.ShapeDtypeStruct((N * grp["d"], grp["O"]), cd)
                    for grp in groups
                ],
                interpret=interpret,
                **_compiler_params(interpret),
            )(*xs, *specs, *tables)

        def run_bwd(xs, tables, gs):
            return pl.pallas_call(
                bwd_kernel,
                grid=grid,
                in_specs=xspec() + sspec() + aspec() + ospec(),
                out_specs=xspec() + aspec(),
                out_shape=[
                    jax.ShapeDtypeStruct((N * grp["d"], grp["M1"]), cd)
                    for grp in groups
                ] + [
                    jax.ShapeDtypeStruct(
                        (self.num_types * grp["M1"], grp["O"]),
                        jnp.float32,
                    )
                    for grp in groups
                ],
                interpret=interpret,
                **_compiler_params(interpret),
            )(*xs, *specs, *tables, *gs)

        @jax.custom_vjp
        def f(xs, tables):
            return run_fwd(xs, tables)

        def f_fwd(xs, tables):
            return run_fwd(xs, tables), (xs, tables)

        def f_bwd(res, gs):
            xs, tables = res
            outs = run_bwd(xs, tables, [g.astype(cd) for g in gs])
            L = len(xs)
            dxs = list(outs[:L])
            dA = list(outs[L:])
            return (
                [d.astype(x.dtype) for d, x in zip(dxs, xs)],
                [d.astype(a.dtype) for d, a in zip(dA, tables)],
            )

        f.defvjp(f_fwd, f_bwd)
        return f

    # ------------------------------------------------------------ interface
    def apply_raw(self, params, x, attrs, species, x_is_table=False):
        """Per-io component-major blocks {io: [N, d, mul_out]} BEFORE the
        final (m, d) transpose — lets the conv's output formatting fold the
        self-connection in and pay the node-sized transpose only once
        (see FactorizedConvolution.apply).  ``x_is_table``: consume the
        kernel-layout node table instead of irreps columns (requires
        ``self._kl_ok``)."""
        N = x.shape[0]
        assert N % self.tile == 0, (N, self.tile)
        if x_is_table:
            assert self._kl_ok
        xs = self._prep_x(x, x_is_table=x_is_table)
        tables = self._tables(params, attrs, species)
        spec = species.reshape(N, 1).astype(jnp.int32)
        specs = [
            jnp.broadcast_to(spec[:, None, :], (N, grp["d"], 1)).reshape(
                N * grp["d"], 1
            )
            for grp in self._groups
        ]
        outs = self._make_fn(N, specs)(xs, tables)  # per group [(N*d), O]
        raw = {}
        for grp, o in zip(self._groups, outs):
            c = 0
            for j in grp["idxs"]:
                it = self.items[j]
                _, _, mul_out = it["shape"]
                io = it["ins"].i_out
                blk = o[:, c: c + mul_out].reshape(N, it["d"], mul_out)
                raw[io] = raw.get(io, 0) + blk
                c += mul_out
        return raw

    def apply(self, params, x, attrs, species):
        N = x.shape[0]
        raw = self.apply_raw(params, x, attrs, species)
        res = []
        for io, mo in enumerate(self.tp.irreps_out):
            if io in raw:
                blk = raw[io]
                res.append(
                    jnp.transpose(blk, (0, 2, 1)).reshape(N, mo.dim)
                    .astype(jnp.float32)
                )
            else:
                res.append(jnp.zeros((N, mo.dim), jnp.float32))
        return jnp.concatenate(res, axis=-1)
