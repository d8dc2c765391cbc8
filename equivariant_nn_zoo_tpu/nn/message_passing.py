"""NequIP-style factorized convolution + gated message-passing block.

Reference parity: e3_layers/nn/message_passing.py (C10 in SURVEY.md §2).

TPU-first shape of the hot loop (§3.3 of SURVEY.md):

    weight  = MLP(edge_radial)                 [E, weight_numel]  (MXU)
    sc      = FCTP(x, node_attrs)              per-node           (MXU)
    x       = Linear(x)                        per-node           (MXU)
    edge_f  = uvu-TP(x[src], Ylm; weight)      per-edge           (VPU einsums)
    msum    = segment_sum(edge_f, dst, N_cap)  static scatter
    x       = Linear_mix(msum)/sqrt(avg_n)+sc  per-node           (MXU)

vs the reference, the expansion's mix-linear is moved *after* the
segment-sum (they commute, the linear has no bias) so the dense mix runs
per-node instead of per-edge — an ~avg_num_neighbors-fold FLOP saving on
the widest matmul.  Everything is static-shaped: the scatter is an XLA
segment-sum over node_capacity slots (padded edges land in the dummy node).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .mlp import FullyConnectedNet
from .module import Module
from .pointwise import LayerNormalization, TensorProductExpansion
from ..ops.gate import Gate, NormActivation, activations
from ..ops.irreps import Irreps, tp_path_exists
from ..ops.segment import segment_sum
from ..ops.tensor_product import Linear, fully_connected_tp
from ..utils.utils import build


class FactorizedConvolution(Module):
    def __init__(
        self,
        input_features,
        output_features,
        node_attrs,
        edge_radial,
        edge_spherical,
        invariant_layers=1,
        invariant_neurons=8,
        avg_num_neighbors=None,
        use_sc=True,
        nonlinearity_scalars: Dict = {"e": "ssp"},
        reduce=True,
        fused: bool = None,
        pallas: bool = None,
        sc_species_types: int = None,
        compute_dtype=None,
        grad_order: int = 1,
    ):
        super().__init__()
        # grad_order >= 2: the layer sits under a GradientOutput (force /
        # score head) whose TRAINING loss double-differentiates through the
        # conv.  The Pallas kernels stay on the hot paths (forward + the
        # first-order force vjp, built with compute_dsh=True so position
        # gradients flow); only the second differentiation falls back to
        # the XLA fused path via the nested custom_vjp in apply().
        self.grad_order = int(grad_order)
        self.init_irreps(
            input_features=input_features,
            output_features=output_features,
            node_attrs=node_attrs,
            edge_radial=edge_radial,
            edge_spherical=edge_spherical,
            output_keys=["output_features"],
        )
        self.avg_num_neighbors = avg_num_neighbors
        self.use_sc = use_sc and ("node_attrs" in self.irreps_in)
        self.reduce = reduce
        self.full_conv = None
        self.species_sc = None

        feature_irreps_in = Irreps(self.irreps_in["input_features"])
        feature_irreps_out = Irreps(self.irreps_out["output_features"])
        irreps_edge_attr = Irreps(self.irreps_in["edge_spherical"])

        self.linear_1 = self.declare_op(
            "linear_1", Linear(feature_irreps_in, feature_irreps_in)
        )
        self.tp = self.add_child(
            "tp",
            TensorProductExpansion(
                feature_irreps_in,
                (irreps_edge_attr, "edge_spherical"),
                (feature_irreps_out, "edge_features"),
                "uvu",
                internal_weight=False,
            ),
        )
        self.fc = self.declare_op(
            "fc",
            FullyConnectedNet(
                [Irreps(self.irreps_in["edge_radial"]).num_irreps]
                + invariant_layers * [invariant_neurons]
                + [self.tp.tp.weight_numel],
                activations["ssp"],
            ),
        )
        if self.use_sc:
            self.sc = self.declare_op(
                "sc",
                fully_connected_tp(
                    feature_irreps_in,
                    Irreps(self.irreps_in["node_attrs"]),
                    feature_irreps_out,
                ),
            )

        # fused MXU path (see ops/fused_tp.py): available when the feature
        # multiplicity is uniform and the edge attrs are mul-1 sh
        import os

        if fused is None:
            fused = os.environ.get("E3_FUSED", "1") == "1"
        self.fused_conv = None
        self.fused_sc = None
        self.edge_conv = None
        if fused:
            try:
                from ..ops.fused_tp import FusedScalarFCTP, FusedUVUConv

                if compute_dtype is None:
                    compute_dtype = os.environ.get("E3_COMPUTE_DTYPE", "bfloat16")
                import jax.numpy as _jnp

                cd = dict(
                    bfloat16=_jnp.bfloat16, float32=_jnp.float32
                )[str(compute_dtype)]
                # Pallas hot loop: default-on for TPU backends unless the
                # model differentiates through its output (force heads /
                # NLL-score heads need second-order autodiff, which the
                # kernel's custom VJP does not provide — those layers are
                # built with pallas=False by the config builders).
                # "force" builds the Pallas paths on a non-TPU backend too
                # (interpret mode) — CI parity tests for the model-level
                # kernel plumbing (kl handoff, sc folding)
                if pallas is None:
                    pallas = os.environ.get("E3_PALLAS", "1") in (
                        "1", "force"
                    )
                self.fused_conv = None
                self.full_conv = None
                self.edge_conv = None
                if (pallas and not reduce and self.grad_order < 2
                        and os.environ.get("E3_PALLAS_EDGECONV", "1") == "1"):
                    # per-edge-output conv (the Pairwise head's neighbor
                    # conv): the v1 kernel minus the segment sum.  Used at
                    # apply time when the edge capacity is tile-aligned.
                    try:
                        import jax as _jax

                        from ..ops.pallas.fused_conv import PallasUVUConv

                        if (_jax.default_backend() == "tpu"
                                or os.environ.get("E3_PALLAS") == "force"):
                            self.edge_conv = PallasUVUConv(
                                self.tp, compute_dtype=cd
                            )
                    except Exception:
                        self.edge_conv = None
                if pallas and reduce:
                    try:
                        import jax as _jax

                        from ..ops.pallas.fused_conv import (
                            PallasFullConv,
                            PallasUVUConv,
                        )

                        if (_jax.default_backend() == "tpu"
                                or os.environ.get("E3_PALLAS") == "force"):
                            # whole-conv kernel, used when the batch is
                            # tile-aligned (GraphBatch edge_tile mode).
                            # INVARIANT: the kernel's VJP writes ZEROS for the
                            # spherical-harmonics cotangent (compute_dsh=False
                            # default) — correct only for models that never
                            # differentiate through positions.  Models that DO
                            # (force heads, layer_configs.addForceOutput) are
                            # built with grad_order>=2, which turns on
                            # compute_dsh and the second-order wrapper below.
                            self.full_conv = PallasFullConv(
                                self.tp, self.fc, compute_dtype=cd,
                                compute_dsh=(self.grad_order >= 2),
                                # sh here is always a real SH encoding
                                # (SphericalEncoding layer): Y00 == 1
                                sh0_const=True,
                            )
                            if (self.use_sc and sc_species_types
                                    and self.grad_order < 2):
                                # node_attrs is a pure species embedding
                                # (featureModel guarantee): per-type tables
                                # instead of per-node conditioning matrices
                                from ..ops.pallas.sc import SpeciesScalarFCTP

                                try:
                                    self.species_sc = SpeciesScalarFCTP(
                                        self.sc, sc_species_types,
                                        compute_dtype=cd,
                                    )
                                except AssertionError:
                                    self.species_sc = None
                            if os.environ.get("E3_PALLAS_V1", "0") == "1":
                                self.fused_conv = PallasUVUConv(
                                    self.tp, compute_dtype=cd
                                )
                    except Exception:
                        self.full_conv = None
                if self.fused_conv is None:
                    self.fused_conv = FusedUVUConv(self.tp, compute_dtype=cd)
                if self.use_sc:
                    try:
                        self.fused_sc = FusedScalarFCTP(self.sc, compute_dtype=cd)
                    except AssertionError:
                        self.fused_sc = None
            except AssertionError:
                self.fused_conv = None

    def _second_order_conv(self, fc_p, lin_p, x, er, sh, tile_args,
                           edge_src, edge_dst, num_nodes, pre,
                           x_table=None, extra_io=None, raw_out=False):
        """Double-grad-capable convolution, fully kernelized.

        Force training (GradientOutput wrapping the net, reference
        e3_layers/nn/output.py:39-43 with create_graph=True) computes
        F = -dE/dpos in the forward pass and then differentiates the loss —
        i.e. it differentiates TWICE through every conv layer.  The
        ``apply_grad2`` path keeps the radial MLP and all layout prep in
        XLA (any-order differentiable) and exposes the 4-linear conv core
        as a Pallas custom-vjp pair whose backward carries its own exact
        second-order vjp built from substituted first-order kernel calls
        (ops/pallas/fused_conv.py:_make_pallas_fn_ext)."""
        return self.full_conv.apply_grad2(
            fc_p, lin_p, x, er, sh, *tile_args, num_nodes, pre_scale=pre,
            x_table=x_table, extra_io=extra_io, raw_out=raw_out,
        )

    def apply(self, params, data: Dict, attrs: Dict):
        edge_radial = data["edge_radial"]
        # masking the radial features zeroes the weights (bias-free MLP) and
        # therefore every padded-edge message — cheaper than masking messages
        if "_edge_mask" in data:
            edge_radial = edge_radial * data["_edge_mask"]
        x = data["input_features"]
        edge_src = data["edge_index"][0]
        edge_dst = data["edge_index"][1]

        # kernel-layout handoff (E3_KLAYOUT=1): the previous MessagePassing
        # layer streamed its gated output as the conv's node-table layout
        # (input_features__kl) alongside the formatted columns; consuming
        # the table drops the per-layer (m, d) transpose round trip
        # (format -> gate -> prep) from the step.  The formatted branch of
        # the producer is then dead code under jit.
        import os as _os

        kl_env = _os.environ.get("E3_KLAYOUT", "1") != "0"
        kl_t = None
        if (kl_env and self.full_conv is not None
                and "_edge_tile_last" in data
                and self.linear_1._kl_eligible()):
            # grad_order>=2 included: every kl leg on the force path is
            # pure XLA (Linear.apply_kl, FusedScalarFCTP.apply_blocks,
            # apply_grad2's table consumption), differentiable to any
            # order
            kl_t = data.get("input_features__kl")

        sc_raw = None
        sc_blocks = None
        if self.use_sc and self.grad_order >= 2:
            # force path: the species-table Pallas sc is first-order
            # only, so grad2 uses the XLA FusedScalarFCTP; under klayout
            # it emits component-major blocks (identical MACs) that fold
            # into the conv's output formatting like sc_raw does below
            if (kl_env and self.full_conv is not None
                    and "_edge_tile_last" in data
                    and self.fused_sc is not None):
                sc_blocks = self.fused_sc.apply_blocks(
                    params["sc"], x, data["node_attrs"], x_table=kl_t
                )
                sc = None
            elif self.fused_sc is not None:
                sc = self.fused_sc.apply(params["sc"], x,
                                         data["node_attrs"])
            else:
                sc = self.sc.apply(params["sc"], x, data["node_attrs"])
        elif self.use_sc:
            if (
                self.species_sc is not None
                and "species" in data
                and x.shape[0] % self.species_sc.tile == 0
            ):
                if self.full_conv is not None and "_edge_tile_last" in data:
                    # component-major blocks folded into the conv's output
                    # formatting (one node-sized transpose for the sum)
                    if kl_t is not None and self.species_sc._kl_ok:
                        sc_raw = self.species_sc.apply_raw(
                            params["sc"], kl_t, data["node_attrs"],
                            data["species"], x_is_table=True,
                        )
                    else:
                        sc_raw = self.species_sc.apply_raw(
                            params["sc"], x, data["node_attrs"],
                            data["species"]
                        )
                    sc = None
                else:
                    sc = self.species_sc.apply(
                        params["sc"], x, data["node_attrs"], data["species"]
                    )
            elif self.fused_sc is not None:
                sc = self.fused_sc.apply(params["sc"], x, data["node_attrs"])
            else:
                sc = self.sc.apply(params["sc"], x, data["node_attrs"])

        x_table = None
        if kl_t is not None:
            x_table = self.linear_1.apply_kl(
                params["linear_1"], kl_t, kl_t.shape[0]
            )
        else:
            x = self.linear_1.apply(params["linear_1"], x)
        tp_params = params["tp"]
        if self.full_conv is not None and "_edge_tile_last" in data:
            # whole-conv Pallas kernel: the radial MLP runs in-kernel, the
            # gather/scatter are windowed one-hot matmuls over the
            # tile-aligned batch layout
            pre = (
                1.0 / (self.avg_num_neighbors ** 0.5)
                if self.avg_num_neighbors is not None
                else None
            )
            tile_args = (
                data["_edge_tile_win"], data["_edge_tile_first"],
                data["_edge_tile_last"], data["_edge_src_local"],
                data["_edge_dst_local"],
            )
            blocks = None
            if self.grad_order >= 2:
                # kl mirror of the first-order branch below: consume the
                # node table, fold the (XLA, any-order) sc blocks, emit
                # blocks for the next layer
                want_blocks = kl_env and (sc_blocks is not None
                                          or not self.use_sc)
                out = self._second_order_conv(
                    params["fc"], tp_params["linear"], x, edge_radial,
                    data["edge_spherical"], tile_args, edge_src, edge_dst,
                    x.shape[0], pre, x_table=x_table, extra_io=sc_blocks,
                    raw_out=want_blocks,
                )
                if want_blocks:
                    out, blocks = out
            else:
                # emit the pre-transpose blocks for the NEXT layer's kl
                # consumption only when the sc is folded in raw form (or
                # absent) — a formatted sc added below would be missing
                # from the blocks
                want_blocks = kl_env and (sc_raw is not None
                                          or not self.use_sc)
                out = self.full_conv(
                    params["fc"], tp_params["linear"], x, edge_radial,
                    data["edge_spherical"], *tile_args,
                    x.shape[0], pre_scale=pre, extra_io=sc_raw,
                    raw_out=want_blocks, x_table=x_table,
                )
                if want_blocks:
                    out, blocks = out
            if self.use_sc and sc_raw is None and sc_blocks is None:
                out = out + sc
            is_per = attrs["input_features"][0]
            ret = {"output_features": out}
            if blocks is not None:
                ret["output_features_blocks"] = blocks
            return (
                ret,
                {"output_features": (is_per,
                                     self.irreps_out["output_features"])},
            )
        weight = self.fc.apply(params["fc"], edge_radial)
        if self.fused_conv is not None:
            # the unfused reduce=False path applies no neighbor-count
            # normalization (see below); mirror that for parity
            pre = (
                1.0 / (self.avg_num_neighbors ** 0.5)
                if self.avg_num_neighbors is not None and self.reduce
                else None
            )
            conv = self.fused_conv
            if (self.edge_conv is not None
                    and edge_src.shape[0] % self.edge_conv.tile == 0):
                conv = self.edge_conv
            out = conv(
                tp_params["linear"], x, edge_src, edge_dst,
                data["edge_spherical"], weight, x.shape[0], pre_scale=pre,
                reduce=self.reduce,
            )
            if self.use_sc:
                out = out + sc
            is_per = attrs["input_features"][0]
            return (
                {"output_features": out},
                {"output_features": (
                    is_per if not self.reduce else "node",
                    self.irreps_out["output_features"],
                )},
            )
        edge_mid = self.tp.tp.apply(
            tp_params["tp"], x[edge_src], data["edge_spherical"], weight
        )
        if self.reduce:
            # scatter the *unmixed* TP output, then mix per-node (commutes)
            mid = segment_sum(edge_mid, edge_dst, x.shape[0])
            out = self.tp.linear.apply(tp_params["linear"], mid)
            if self.avg_num_neighbors is not None:
                out = out / (self.avg_num_neighbors ** 0.5)
            if self.use_sc:
                out = out + sc
        else:
            out = self.tp.linear.apply(tp_params["linear"], edge_mid)

        is_per = attrs["input_features"][0]
        out_attrs = {
            "output_features": (
                is_per if not self.reduce else "node",
                self.irreps_out["output_features"],
            )
        }
        return {"output_features": out}, out_attrs


class MessagePassing(Module):
    """Convolution + gate/norm nonlinearity + optional resnet + layer norm.

    Reference parity: message_passing.py:126-262, including the
    tp_path_exists-based narrowing of scalar/gated irreps.
    """

    def __init__(
        self,
        input_features,
        output_features,
        node_attrs,
        edge_radial,
        edge_spherical,
        convolution,
        resnet: bool = False,
        nonlinearity_type: str = "gate",
        nonlinearity_scalars: Dict = {"e": "ssp", "o": "tanh"},
        nonlinearity_gates: Dict = {"e": "ssp", "o": "abs"},
        normalize=False,
    ):
        super().__init__()
        self.init_irreps(
            input_features=input_features,
            output_features=output_features,
            node_attrs=node_attrs,
            edge_radial=edge_radial,
            edge_spherical=edge_spherical,
            output_keys=["output_features"],
        )
        assert nonlinearity_type in ("gate", "norm")
        nonlinearity_scalars = {
            1: nonlinearity_scalars["e"],
            -1: nonlinearity_scalars["o"],
        }
        nonlinearity_gates = {
            1: nonlinearity_gates["e"],
            -1: nonlinearity_gates["o"],
        }

        edge_attr_irreps = Irreps(self.irreps_in["edge_spherical"])
        irreps_layer_out_prev = Irreps(self.irreps_in["input_features"])
        feature_irreps_hidden = Irreps(self.irreps_out["output_features"])

        irreps_scalars = Irreps(
            [
                (mi.mul, mi.ir)
                for mi in feature_irreps_hidden
                if mi.ir.l == 0
                and tp_path_exists(irreps_layer_out_prev, edge_attr_irreps, mi.ir)
            ]
        )
        irreps_gated = Irreps(
            [
                (mi.mul, mi.ir)
                for mi in feature_irreps_hidden
                if mi.ir.l > 0
                and tp_path_exists(irreps_layer_out_prev, edge_attr_irreps, mi.ir)
            ]
        )
        irreps_layer_out = (irreps_scalars + irreps_gated).simplify()

        if nonlinearity_type == "gate":
            irreps_gates = Irreps([(mi.mul, "0e") for mi in irreps_gated])
            self.equivariant_nonlin = Gate(
                irreps_scalars=irreps_scalars,
                act_scalars=[
                    nonlinearity_scalars[mi.ir.p] for mi in irreps_scalars
                ],
                irreps_gates=irreps_gates,
                act_gates=[nonlinearity_gates[mi.ir.p] for mi in irreps_gates],
                irreps_gated=irreps_gated,
            )
            conv_irreps_out = self.equivariant_nonlin.irreps_in.simplify()
        else:
            conv_irreps_out = irreps_layer_out.simplify()
            self.equivariant_nonlin = NormActivation(
                conv_irreps_out,
                nonlinearity_scalars[1],
                normalize=True,
                epsilon=1e-8,
                bias=False,
            )

        self.resnet = bool(resnet) and irreps_layer_out == irreps_layer_out_prev

        # kernel-layout handoff plan (E3_KLAYOUT=1): map the conv's
        # SIMPLIFIED output slots back to the gate's unsimplified entries
        # (simplify only merges adjacent equal irreps, so each gate entry
        # is a contiguous channel range of one conv slot), and require a
        # single uniform multiplicity on the gate's OUTPUT entries so the
        # gated blocks stack into the next layer's node table
        # (fused_conv._prep_x_nodes layout).
        self._kl_split = None
        self._kl_out_mul = None
        if nonlinearity_type == "gate":
            conv_ir = Irreps(conv_irreps_out)
            split = []
            io, used = 0, 0
            ok = len(conv_ir) > 0
            for mi in self.equivariant_nonlin.irreps_in:
                while io < len(conv_ir) and used == conv_ir[io].mul:
                    io += 1
                    used = 0
                if (io >= len(conv_ir) or conv_ir[io].ir != mi.ir
                        or used + mi.mul > conv_ir[io].mul):
                    ok = False
                    break
                split.append((io, used, mi.mul, mi.ir.dim))
                used += mi.mul
            if ok and not (io == len(conv_ir) - 1
                           and used == conv_ir[io].mul):
                ok = False
            out_ir = self.equivariant_nonlin.irreps_out
            muls = {mi.mul for mi in out_ir}
            if ok and len(muls) == 1 and len(out_ir):
                self._kl_split = split
                self._kl_out_mul = muls.pop()
        in_custom = next(
            (k for k, v in self.input_key_mapping.items()
             if v == "input_features"),
            "input_features",
        )
        self._kl_in_key = in_custom + "__kl"
        out_custom = self.output_key_mapping.get(
            "output_features", "output_features"
        )
        self._kl_out_key = out_custom + "__kl"

        self.conv = self.add_child(
            "conv",
            build(
                convolution,
                input_features=input_features,
                output_features=conv_irreps_out,
                node_attrs=node_attrs,
                edge_radial=edge_radial,
                edge_spherical=edge_spherical,
            ),
        )
        self.normalize = normalize
        if self.normalize:
            self.norm = self.add_child(
                "norm",
                LayerNormalization(
                    self.irreps_out["output_features"],
                    self.irreps_out["output_features"],
                ),
            )

    def apply(self, params, data: Dict, attrs: Dict):
        import os as _os

        old_x = data["input_features"]
        # kl handoff (E3_KLAYOUT=1): alias the incoming kernel-layout
        # table (written by the previous layer under its OUTPUT custom
        # key + "__kl", passed through the key maps untouched) to the
        # conv's internal name
        kl_env = _os.environ.get("E3_KLAYOUT", "1") != "0"
        if kl_env and self._kl_in_key in data:
            data = dict(data)
            data["input_features__kl"] = data[self._kl_in_key]
        conv_out, _ = self.conv.apply(params["conv"], data, attrs)
        output = conv_out["output_features"]
        output = self.equivariant_nonlin(output)
        blocks = conv_out.get("output_features_blocks")
        if self.resnet:
            output = old_x + output
        if self.normalize:
            normed, _ = self.norm.apply(
                params["norm"], {"input": output},
                {"input": (attrs["input_features"][0],
                           self.irreps_out["output_features"])},
            )
            output = normed["output"]
        is_per = attrs["input_features"][0]
        out_attrs = {
            "output_features": (is_per, self.irreps_out["output_features"])
        }
        ret = {"output_features": output}
        if (blocks is not None and self._kl_split is not None
                and not self.resnet and not self.normalize):
            # gate the pre-transpose conv blocks in kernel layout and
            # emit the next layer's node table; under jit, whichever of
            # {formatted output, kl table} the next layer leaves unread
            # is dead code, so emitting both costs nothing
            N = output.shape[0]
            entries = []
            for io, ofs, m, d in self._kl_split:
                blk = blocks.get(io)
                if blk is None:
                    entries.append(jnp.zeros((N, d, m), jnp.float32))
                else:
                    entries.append(
                        blk[:, :, ofs: ofs + m].astype(jnp.float32)
                    )
            out_blocks = self.equivariant_nonlin.apply_kl(entries)
            table = jnp.concatenate(out_blocks, axis=1).reshape(N, -1)
            # store the table in the conv's compute dtype (E3_KL_CD=0 for
            # f32): every consumer (conv x load, sc table, linear_1 input
            # rounding) casts to compute dtype anyway, so the rounding
            # just moves to the producer and the table's HBM round trip
            # halves.  Gate math above stays f32.  No-op when the compute
            # dtype IS f32 (CI).
            fc_conv = getattr(self.conv, "full_conv", None)
            if (fc_conv is not None
                    and _os.environ.get("E3_KL_CD", "1") != "0"):
                table = table.astype(fc_conv.compute_dtype)
            ret[self._kl_out_key] = table
            out_attrs[self._kl_out_key] = (is_per, str(table.shape[-1]))
        return ret, out_attrs
