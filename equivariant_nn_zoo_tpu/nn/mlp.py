"""Scalar MLP with normalized parameterization (replaces
``e3nn.nn.FullyConnectedNet``, used for the radial weight network at
e3_layers/nn/message_passing.py:74-79)."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..ops.gate import normalize2mom


class FullyConnectedNet:
    """ops-style component: param_specs() + apply(params, x).

    Weights are stored N(0,1) and scaled by 1/sqrt(fan_in) at apply time;
    the activation (normalized to unit second moment, as e3nn does) runs
    between layers (not after the last).
    """

    def __init__(self, dims: List[int], activation="ssp"):
        assert len(dims) >= 2
        self.dims = list(dims)
        self.act = normalize2mom(activation)

    def param_specs(self):
        return {
            f"w{i}": ((self.dims[i], self.dims[i + 1]), "normal")
            for i in range(len(self.dims) - 1)
        }

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.dims) - 1
        for i in range(n):
            w = params[f"w{i}"]
            x = x @ (w / jnp.sqrt(jnp.asarray(float(self.dims[i]), x.dtype)))
            if i < n - 1:
                x = self.act(x)
        return x
