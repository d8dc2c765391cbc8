"""Embedding layers: one-hot species, radial Bessel basis with polynomial /
symmetric cutoffs, spherical-harmonic edge encoding, graph→node/edge
broadcast, chain-aware relative-position encoding.

Reference parity: e3_layers/nn/embedding.py (C8 in SURVEY.md §2).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module
from ..ops.irreps import Irreps
from ..ops.spherical_harmonics import spherical_harmonics
from ..utils.utils import build


def poly_cutoff(x, factor: float, p: float = 6.0):
    """DimeNet polynomial envelope. Reference: embedding.py:31-40."""
    x = x * factor
    out = 1.0
    out = out - ((p + 1.0) * (p + 2.0) / 2.0) * jnp.power(x, p)
    out = out + p * (p + 2.0) * jnp.power(x, p + 1.0)
    out = out - (p * (p + 1.0) / 2.0) * jnp.power(x, p + 2.0)
    return out * (x < 1.0)


def symmetric_cutoff(x, factor: float, p: float = 6.0):
    """Symmetric bump envelope on [-1, 1] (used for time/relative-position
    embeddings). Reference: embedding.py:26-29."""
    x = x * factor
    return (x - 1) ** 2 * (x + 1) ** 2 * (jnp.abs(x) < 1.0)


_cutoffs = {"poly": poly_cutoff, "symmetric": symmetric_cutoff}


class PolynomialCutoff:
    """Reference parity: embedding.py:43-71."""

    def __init__(self, r_max: float, p: float = 6, cutoff=poly_cutoff):
        assert p >= 2.0
        self.p = float(p)
        self._factor = 1.0 / float(r_max)
        self.cutoff = _cutoffs.get(cutoff, cutoff) if isinstance(cutoff, str) else cutoff

    def __call__(self, x):
        return self.cutoff(x, self._factor, p=self.p)


class BesselBasis:
    """Radial Bessel basis sin(n pi x / c)/x (DimeNet).

    Reference parity: embedding.py:74-127 — trainable frequencies, optional
    1/r singularity (``one_over_r``) for interatomic distances.
    ops-style component (param_specs/apply).
    """

    def __init__(self, r_max, r_min=0, num_basis=8, trainable=True,
                 one_over_r=True):
        self.trainable = trainable
        self.num_basis = num_basis
        self.r_max = float(r_max)
        self.r_min = float(r_min)
        self.prefactor = 2.0 / (self.r_max - self.r_min)
        self.one_over_r = one_over_r
        self._init_freqs = (
            np.linspace(1.0, num_basis, num_basis) * math.pi
        ).astype(np.float32)

    def param_specs(self):
        if not self.trainable:
            return {}
        return {"bessel_weights": ((self.num_basis,), self._init_freqs)}

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        w = params["bessel_weights"] if self.trainable else jnp.asarray(
            self._init_freqs
        )
        num = jnp.sin(w * x[..., None] / (self.r_max - self.r_min))
        out = self.prefactor * num
        if self.one_over_r:
            # padded edges carry epsilon-clamped lengths, so this stays finite
            out = out / x[..., None]
        return out


class OneHotEncoding(Module):
    """Integer species -> one-hot scalars. Reference: embedding.py:257-281."""

    def __init__(self, num_types: int, irreps_out, irreps_in="0x0e"):
        super().__init__()
        self.num_types = num_types
        self.init_irreps(input=irreps_in, one_hot=irreps_out, output_keys="one_hot")

    def apply(self, params, data: Dict, attrs: Dict):
        types = data["input"].reshape(-1).astype(jnp.int32)
        one_hot = jax.nn.one_hot(types, self.num_types, dtype=jnp.float32)
        out_attrs = {"one_hot": (attrs["input"][0], self.irreps_out["one_hot"])}
        return {"one_hot": one_hot}, out_attrs


class RadialBasisEncoding(Module):
    """Bessel basis × cutoff embedding of a positive scalar.

    Reference parity: embedding.py:181-219.
    """

    def __init__(self, r_max, trainable, irreps_out, r_min=0,
                 polynomial_degree=6, basis=BesselBasis, cutoff=poly_cutoff,
                 irreps_in="1x0e", one_over_r=True):
        super().__init__()
        self.init_irreps(
            input=irreps_in, radial_embedding=irreps_out,
            output_keys=["radial_embedding"],
        )
        num_basis = Irreps(self.irreps_out["radial_embedding"])[0].mul
        if isinstance(cutoff, str):
            cutoff = _cutoffs[cutoff]
        if isinstance(basis, str):
            basis = {"bessel": BesselBasis}[basis]
        self.basis = basis(r_max, r_min, num_basis, trainable,
                           one_over_r=one_over_r)
        self.declare_op("basis", self.basis)
        self.cutoff = PolynomialCutoff(r_max, p=polynomial_degree, cutoff=cutoff)
        self.r_max = r_max

    def apply(self, params, data: Dict, attrs: Dict):
        x = data["input"]
        is_per = attrs["input"][0]
        x1 = x[..., 0] if x.ndim == 2 else x
        embedded = self.basis.apply(params["basis"], x1) * self.cutoff(x1)[:, None]
        embedded = embedded.reshape(x.shape[0], -1)
        out_attrs = {
            "radial_embedding": (is_per, self.irreps_out["radial_embedding"])
        }
        return {"radial_embedding": embedded}, out_attrs


class SphericalEncoding(Module):
    """Spherical-harmonic projection of (edge) vectors.

    Reference parity: embedding.py:130-178; normalization fixed to e3nn's
    ("component", normalize=True) as the reference defaults.
    """

    def __init__(self, irreps_out, edge_sh_normalization="component",
                 edge_sh_normalize=True, irreps_in="1x1o"):
        super().__init__()
        self.init_irreps(
            vectors=irreps_in, spherical_harmonics=irreps_out,
            output_keys=["spherical_harmonics"],
        )
        self.mul = Irreps(self.irreps_in["vectors"])[0].mul
        self.ls = []
        for mi in Irreps(self.irreps_out["spherical_harmonics"]):
            assert mi.mul == self.mul
            self.ls.append(mi.ir.l)
        self.normalize = edge_sh_normalize
        self.normalization = edge_sh_normalization

    def apply(self, params, data: Dict, attrs: Dict):
        vectors = data["vectors"]
        cat = vectors.shape[0]
        v = vectors.reshape(cat, self.mul, 3)
        sh = spherical_harmonics(
            self.ls, v, normalize=self.normalize,
            normalization=self.normalization,
        ).reshape(cat, -1)
        out_attrs = {
            "spherical_harmonics": ("edge", self.irreps_out["spherical_harmonics"])
        }
        return {"spherical_harmonics": sh}, out_attrs


class Broadcast(Module):
    """Broadcast graph features to nodes or edges.

    Reference parity: embedding.py:222-254.  Padded slots gather (clamped)
    garbage that downstream masks ignore.
    """

    def __init__(self, irreps_in, irreps_out, to):
        super().__init__()
        self.init_irreps(input=irreps_in, output=irreps_out, output_keys=["output"])
        self.to = to

    def apply(self, params, data: Dict, attrs: Dict):
        is_per = attrs["input"][0]
        assert is_per == "graph", "Broadcast expects graph-level input"
        x = data["input"]
        if self.to == "node":
            seg = data["_node_segment"]
        elif self.to == "edge":
            seg = data["_edge_segment"]
        else:
            raise ValueError(f"cannot broadcast to {self.to!r}")
        out = x[jnp.clip(seg, 0, x.shape[0] - 1)]
        return {"output": out}, {"output": (self.to, self.irreps_out["output"])}


class RelativePositionEncoding(Module):
    """Chain-aware sequence-distance encoding on edges.

    Reference parity: embedding.py:283-312 — relative residue index masked to
    the same chain (else a 1e5 sentinel that lands outside the radial
    cutoff), then radially embedded.
    """

    def __init__(self, radial_encoding, segment, irreps_out, id=None):
        super().__init__()
        self.init_irreps(input=segment, output=irreps_out, id=id,
                         output_keys=["output"])
        radial_encoding = dict(radial_encoding)
        radial_encoding["irreps_in"] = "1x0e"
        radial_encoding["irreps_out"] = self.irreps_out["output"]
        self.radial = self.add_child("radial", build(radial_encoding))

    def apply(self, params, data: Dict, attrs: Dict):
        segment = data["input"]
        edge_index = data["edge_index"]
        if "id" in self.irreps_in and self.irreps_in["id"] is not None:
            idv = data["id"]
            rel = idv[edge_index[0]] - idv[edge_index[1]]
        else:
            rel = (edge_index[0] - edge_index[1]).astype(jnp.float32)
        mask = (segment[edge_index[0]] == segment[edge_index[1]]).astype(
            jnp.float32
        ).reshape(-1, 1)
        rel = mask * rel.reshape(-1, 1) + (1 - mask) * 1e5
        out, _ = self.radial.apply(
            params["radial"], {"input": rel}, {"input": ("edge", "1x0e")}
        )
        return (
            {"output": out["radial_embedding"]},
            {"output": ("edge", self.irreps_out["output"])},
        )
