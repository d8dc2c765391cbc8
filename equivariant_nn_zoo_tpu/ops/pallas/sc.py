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

Gradients: the per-type representative attrs row receives the summed
cotangent of every node of that type, which is exactly the embedding-row
gradient (all nodes of a type share the same embedding row), so end-to-end
parameter gradients are identical to the per-node formulation.

Each irrep slot is fed as a row-expanded [(N*d_l), mul] array prepared in
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
        for ins in tp.instructions:
            shape = tp._weight_shape(ins)  # (mul1, mul2, mul_out)
            n = int(np.prod(shape))
            d = ir1[ins.i_in1].ir.dim
            self.items.append(dict(
                ins=ins, w_ofs=w_ofs, shape=shape, d=d,
                x_ofs=x_offsets[ins.i_in1],
            ))
            w_ofs += n

    # ------------------------------------------------------------------ XLA
    def _tables(self, params, attrs, species):
        """Per-slot per-type conditioning tables A_l [types*mul1, mul_out]."""
        cd = self.compute_dtype
        weight = params["weight"]
        spec = species.reshape(-1).astype(jnp.int32)
        rep = jnp.zeros((self.num_types, self.mul2), attrs.dtype)
        rep = rep.at[spec].set(attrs)
        tables = []
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
            tables.append(A.reshape(self.num_types * mul1, mul_out))
        return tables

    def _prep_x(self, x):
        """x [N, in_dim] -> per-slot row-expanded blocks [(N*d_l), mul1]."""
        N = x.shape[0]
        blocks = []
        for it in self.items:
            mul1, _, _ = it["shape"]
            d = it["d"]
            b = x[:, it["x_ofs"]: it["x_ofs"] + mul1 * d]
            blocks.append(
                jnp.transpose(b.reshape(N, mul1, d), (0, 2, 1)).reshape(
                    N * d, mul1
                ).astype(self.compute_dtype)
            )
        return blocks

    # -------------------------------------------------------------- kernels
    def _fwd_kernel(self):
        items, types = self.items, self.num_types
        cd = self.compute_dtype
        L = len(items)

        def kernel(*args):
            x_refs = args[:L]
            spec_refs = args[L: 2 * L]
            A_refs = args[2 * L: 3 * L]
            out_refs = args[3 * L:]
            for li, it in enumerate(items):
                mul1, _, mul_out = it["shape"]
                xb = x_refs[li][...]          # [(Tn*d), mul1]
                spec = spec_refs[li][...]     # [(Tn*d), 1]
                A = A_refs[li][...]
                acc = None
                for t in range(types):
                    res = jax.lax.dot_general(
                        xb, A[t * mul1: (t + 1) * mul1, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    m = (spec == t).astype(jnp.float32)
                    acc = m * res if acc is None else acc + m * res
                out_refs[li][...] = acc.astype(out_refs[li].dtype)

        return kernel

    def _bwd_kernel(self):
        import jax.experimental.pallas as pl

        items, types = self.items, self.num_types
        cd = self.compute_dtype
        L = len(items)

        def kernel(*args):
            x_refs = args[:L]
            spec_refs = args[L: 2 * L]
            A_refs = args[2 * L: 3 * L]
            g_refs = args[3 * L: 4 * L]
            dx_refs = args[4 * L: 5 * L]
            dA_refs = args[5 * L: 6 * L]
            first = pl.program_id(0) == 0
            for li, it in enumerate(items):
                mul1, _, mul_out = it["shape"]
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
                        gm, A[t * mul1: (t + 1) * mul1, :],
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

        items, Tn = self.items, self.tile
        cd = self.compute_dtype
        fwd_kernel = self._fwd_kernel()
        bwd_kernel = self._bwd_kernel()
        interpret = _use_interpret()
        grid = (N // Tn,)

        def xspec():
            return [
                pl.BlockSpec((Tn * it["d"], it["shape"][0]),
                             lambda t: (t, 0))
                for it in items
            ]

        def sspec():
            return [
                pl.BlockSpec((Tn * it["d"], 1), lambda t: (t, 0))
                for it in items
            ]

        def ospec():
            return [
                pl.BlockSpec((Tn * it["d"], it["shape"][2]),
                             lambda t: (t, 0))
                for it in items
            ]

        def aspec():
            return [
                pl.BlockSpec(
                    (self.num_types * it["shape"][0], it["shape"][2]),
                    lambda t: (0, 0),
                )
                for it in items
            ]

        def run_fwd(xs, tables):
            return pl.pallas_call(
                fwd_kernel,
                grid=grid,
                in_specs=xspec() + sspec() + aspec(),
                out_specs=ospec(),
                out_shape=[
                    jax.ShapeDtypeStruct((N * it["d"], it["shape"][2]), cd)
                    for it in items
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
                    jax.ShapeDtypeStruct((N * it["d"], it["shape"][0]), cd)
                    for it in items
                ] + [
                    jax.ShapeDtypeStruct(
                        (self.num_types * it["shape"][0], it["shape"][2]),
                        jnp.float32,
                    )
                    for it in items
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
    def apply_raw(self, params, x, attrs, species):
        """Per-io component-major blocks {io: [N, d, mul_out]} BEFORE the
        final (m, d) transpose — lets the conv's output formatting fold the
        self-connection in and pay the node-sized transpose only once
        (see FactorizedConvolution.apply)."""
        N = x.shape[0]
        assert N % self.tile == 0, (N, self.tile)
        xs = self._prep_x(x)
        tables = self._tables(params, attrs, species)
        spec = species.reshape(N, 1).astype(jnp.int32)
        specs = [
            jnp.broadcast_to(spec[:, None, :], (N, it["d"], 1)).reshape(
                N * it["d"], 1
            )
            for it in self.items
        ]
        outs = self._make_fn(N, specs)(xs, tables)  # per slot [(N*d), w]
        raw = {}
        for it, o in zip(self.items, outs):
            _, _, mul_out = it["shape"]
            io = it["ins"].i_out
            blk = o.reshape(N, it["d"], mul_out)
            raw[io] = raw.get(io, 0) + blk
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
