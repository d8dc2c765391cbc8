"""Pointwise equivariant layers: linear, layer norm, tensor-product
expansion, residual block, concat/split.

Reference parity: e3_layers/nn/pointwise.py (C9 in SURVEY.md §2).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .module import Module
from ..ops.gate import NormActivation, resolve_activation
from ..ops.irreps import Irreps
from ..ops.tensor_product import Linear, TensorProduct


class PointwiseLinear(Module):
    """Irreps-aware linear with biases on scalar outputs.

    Reference parity: pointwise.py:14-30.
    """

    def __init__(self, irreps_in, irreps_out, biases=True, **kwargs):
        super().__init__()
        self.init_irreps(input=irreps_in, output=irreps_out, output_keys=["output"])
        self.linear = self.declare_op(
            "linear",
            Linear(self.irreps_in["input"], self.irreps_out["output"], biases=biases),
        )

    def apply(self, params, data: Dict, attrs: Dict):
        out = self.linear.apply(params["linear"], data["input"])
        out_attrs = {"output": (attrs["input"][0], self.irreps_out["output"])}
        return {"output": out}, out_attrs


class LayerNormalization(Module):
    """Per-irrep RMS normalization with a learned scale.

    Reference parity: pointwise.py:32-51 (norm averaged over multiplicity,
    eps 1e-6, one trainable std per irrep slice).
    """

    def __init__(self, irreps_in, irreps_out, **kwargs):
        super().__init__()
        self.init_irreps(input=irreps_in, output=irreps_out, output_keys=["output"])
        assert Irreps(self.irreps_in["input"]) == Irreps(self.irreps_out["output"])
        irreps = Irreps(self.irreps_in["input"])
        self.muls = [mi.mul for mi in irreps]
        self.irreps = irreps
        self.declare("std", (len(self.muls),), "ones")

    def apply(self, params, data: Dict, attrs: Dict):
        x = data["input"]
        outs = []
        for i, (sl, mul) in enumerate(zip(self.irreps.slices(), self.muls)):
            tmp = x[:, sl]
            norm = jnp.sum(tmp * tmp, axis=-1, keepdims=True)
            norm = jnp.sqrt(norm / mul + 1e-6)
            outs.append(tmp / norm * params["std"][i])
        return {"output": jnp.concatenate(outs, axis=-1)}, dict(attrs)


class TensorProductExpansion(Module):
    """uvu/uvw tensor product into all reachable intermediate irreps,
    followed by an equivariant linear mix into the requested output.

    Reference parity: pointwise.py:54-100.  ``internal_weight=False`` takes
    per-element weights (the factorized convolution's radial MLP output).
    The TP and the mix-linear are exposed separately (``tp`` / ``linear``)
    so callers can reorder the linear past a segment reduction (they
    commute) — the conv uses that to run the mix per-node instead of
    per-edge.
    """

    def __init__(self, left, right, output, instruction="uvu",
                 internal_weight=True, **kwargs):
        super().__init__()
        self.init_irreps(left=left, right=right, output=output,
                         output_keys=["output"])
        irreps_left = Irreps(self.irreps_in["left"])
        irreps_right = Irreps(self.irreps_in["right"])
        irreps_out = Irreps(self.irreps_out["output"])

        irreps_mid = []
        instructions = []
        for i, mi_l in enumerate(irreps_left):
            for j, mi_r in enumerate(irreps_right):
                for ir_out in mi_l.ir * mi_r.ir:
                    if ir_out in irreps_out:
                        k = len(irreps_mid)
                        irreps_mid.append((mi_l.mul, ir_out))
                        instructions.append((i, j, k, instruction, True))
        irreps_mid = Irreps(irreps_mid)
        sorted_mid = irreps_mid.sort()
        instructions = [
            (i1, i2, sorted_mid.p[k], mode, train)
            for i1, i2, k, mode, train in instructions
        ]
        self.irreps_mid = sorted_mid.irreps
        self.internal_weight = internal_weight
        self.tp = self.declare_op(
            "tp",
            TensorProduct(
                irreps_left, irreps_right, self.irreps_mid, instructions,
                shared_weights=internal_weight,
                internal_weights=internal_weight,
            ),
        )
        self.linear = self.declare_op(
            "linear",
            Linear(self.irreps_mid.simplify(), irreps_out, biases=False),
        )

    def expand(self, params, left, right, weight=None):
        """tp (+ external weights) then linear mix — the reference forward."""
        mid = self.tp.apply(params["tp"], left, right, weight)
        return self.linear.apply(params["linear"], mid)

    def apply(self, params, data: Dict, attrs: Dict):
        out = self.expand(params, data["left"], data["right"],
                          data.get("weight"))
        is_per = attrs["left"][0]
        out_attrs = {"output": (is_per, self.irreps_out["output"])}
        return {"output": out}, out_attrs


class ResBlock(Module):
    """Equivariant residual block: x + linear(norm_act(x)), with a second
    linear if the output irreps differ.

    Reference parity: pointwise.py:103-132.  Also callable directly on a
    tensor via ``block(params, x)`` like the reference's tensor path.
    """

    def __init__(self, irreps_in, irreps_out, activation="silu", biases=True,
                 **kwargs):
        super().__init__()
        self.init_irreps(input=irreps_in, output=irreps_out, output_keys=["output"])
        ir_in = Irreps(self.irreps_in["input"])
        ir_out = Irreps(self.irreps_out["output"])
        self.same = ir_in == ir_out
        self.linear_1 = self.declare_op("linear_1", Linear(ir_in, ir_in, biases=biases))
        if not self.same:
            self.linear_2 = self.declare_op(
                "linear_2", Linear(ir_in, ir_out, biases=biases)
            )
        self.act = NormActivation(ir_in, resolve_activation(activation))

    def block(self, params, x):
        out = x + self.linear_1.apply(params["linear_1"], self.act(x))
        if not self.same:
            out = self.linear_2.apply(params["linear_2"], out)
        return out

    def apply(self, params, data: Dict, attrs: Dict):
        out = self.block(params, data["input"])
        is_per = attrs["input"][0]
        return {"output": out}, {"output": (is_per, self.irreps_out["output"])}


class Concat(Module):
    """Concatenate several irreps features and mix linearly.

    Reference parity: pointwise.py:134-152.
    """

    def __init__(self, irreps_out, **irreps_in):
        super().__init__()
        self.init_irreps(**irreps_in, output=irreps_out, output_keys=["output"])
        cat = Irreps(None)
        for value in self.irreps_in.values():
            cat = cat + Irreps(value)
        self.linear = self.declare_op(
            "linear", Linear(cat, Irreps(self.irreps_out["output"]), biases=True)
        )

    def apply(self, params, data: Dict, attrs: Dict):
        x = jnp.concatenate([data[key] for key in self.irreps_in.keys()], axis=1)
        out = self.linear.apply(params["linear"], x)
        first = list(self.irreps_in.keys())[0]
        is_per = attrs[first][0]
        return {"output": out}, {"output": (is_per, self.irreps_out["output"])}


class Split(Module):
    """Linear then split into named outputs along irreps boundaries.

    Reference parity: pointwise.py:154-175 (with the slicing applied to the
    feature axis).
    """

    def __init__(self, irreps_in, **irreps_out):
        super().__init__()
        self.init_irreps(input=irreps_in, **irreps_out,
                         output_keys=[key for key in irreps_out])
        cat = Irreps(None)
        self.out_dims = {}
        for key, value in self.irreps_out.items():
            cat = cat + Irreps(value)
            self.out_dims[key] = Irreps(value).dim
        self.linear = self.declare_op(
            "linear", Linear(Irreps(self.irreps_in["input"]), cat, biases=True)
        )

    def apply(self, params, data: Dict, attrs: Dict):
        result = self.linear.apply(params["linear"], data["input"])
        out = {}
        cnt = 0
        for key, dim in self.out_dims.items():
            out[key] = result[..., cnt : cnt + dim]
            cnt += dim
        is_per = attrs["input"][0]
        out_attrs = {key: (is_per, value) for key, value in self.irreps_out.items()}
        return out, out_attrs
