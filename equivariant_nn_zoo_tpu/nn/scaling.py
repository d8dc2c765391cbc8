"""Per-atom-type affine rescaling of scalar outputs.

Reference parity: e3_layers/nn/scaling.py (C12 in SURVEY.md §2) — shifts are
applied after scaling; either can be trainable or a fixed constant.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from .module import Module


class PerTypeScaleShift(Module):
    def __init__(
        self,
        num_types: int,
        shifts: Optional[List[float]],
        scales: Optional[List[float]],
        scales_trainable: bool = False,
        shifts_trainable: bool = False,
        irreps_in="1x0e",
        irreps_out="1x0e",
        species="1x0e",
    ):
        super().__init__()
        self.num_types = num_types
        self.init_irreps(
            input=irreps_in, output=irreps_out, species=species,
            output_keys=["output"],
        )

        def expand(v):
            v = np.asarray(v, dtype=np.float32).reshape(-1)
            if v.size == 1:
                v = np.full((num_types,), float(v[0]), np.float32)
            assert v.shape == (num_types,), f"invalid shape {v.shape}"
            return v

        self.has_shifts = shifts is not None
        self.shifts_trainable = shifts_trainable
        if self.has_shifts:
            shifts = expand(shifts)
            if shifts_trainable:
                self.declare("shifts", (num_types,), shifts)
            else:
                self._shifts = jnp.asarray(shifts)
        self.has_scales = scales is not None
        self.scales_trainable = scales_trainable
        if self.has_scales:
            scales = expand(scales)
            if scales_trainable:
                self.declare("scales", (num_types,), scales)
            else:
                self._scales = jnp.asarray(scales)

    def apply(self, params, data: Dict, attrs: Dict):
        species = data["species"].reshape(-1).astype(jnp.int32)
        x = data["input"]
        if self.has_scales:
            scales = params["scales"] if self.scales_trainable else self._scales
            x = scales[species][:, None] * x
        if self.has_shifts:
            shifts = params["shifts"] if self.shifts_trainable else self._shifts
            x = shifts[species][:, None] + x
            # padded node slots must stay zero so graph pooling is exact
            if "_node_mask" in data and attrs["input"][0] == "node":
                x = x * data["_node_mask"]
        is_per = attrs["input"][0]
        return {"output": x}, {"output": (is_per, self.irreps_out["output"])}
