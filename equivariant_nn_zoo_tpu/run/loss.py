"""Loss system: reflection by name, per-atom / per-species wrappers, NaN
masking, coefficient-weighted multi-key totals, running stats.

Reference parity: e3_layers/run/loss.py (C17 in SURVEY.md §2), adapted to
padded static-shape batches: every reduction is a *masked* mean using the
batch's ``_graph_mask``/``_node_mask``/``_edge_mask`` so padding never leaks
into the loss.  All of this runs inside the jitted train step.
"""

from __future__ import annotations

import inspect
import logging
from typing import Dict, List, Union

import jax.numpy as jnp
import numpy as np


def _elementwise(func_name: str, pred, ref):
    if func_name == "MSELoss":
        return (pred - ref) ** 2
    if func_name == "L1Loss":
        return jnp.abs(pred - ref)
    if func_name == "HuberLoss":
        d = pred - ref
        a = jnp.abs(d)
        return jnp.where(a < 1.0, 0.5 * d * d, a - 0.5)
    raise NotImplementedError(f"loss function {func_name!r}")


def _mask_for(key: str, ref: Dict):
    """Pick the padding mask matching the key's per-ness (works for plain
    [cat, d] and device-stacked [D, cat, d] batches)."""
    if key not in ref:
        return None
    lead = ref[key].shape[:-1]
    for mk in ("_graph_mask", "_node_mask", "_edge_mask"):
        if mk in ref and ref[mk].shape[:-1] == lead:
            return ref[mk]
    return None


class SimpleLoss:
    """Reference parity: loss.py:13-57 (with padding masks)."""

    def __init__(self, func_name: str, params: dict = {}):
        params = dict(params)
        self.ignore_nan = params.pop("ignore_nan", False)
        self.func_name = func_name

    def raw(self, pred, ref, key):
        p, r = pred[key], ref[key]
        if self.ignore_nan:
            not_nan = jnp.isfinite(r).astype(p.dtype)
            loss = _elementwise(self.func_name, p, jnp.nan_to_num(r)) * not_nan
        else:
            not_nan = jnp.ones_like(p)
            loss = _elementwise(self.func_name, p, r)
        mask = _mask_for(key, ref)
        if mask is not None:
            loss = loss * mask
            not_nan = not_nan * mask
        return loss, not_nan

    def __call__(self, pred: dict, ref: dict, key: str, mean: bool = True):
        loss, not_nan = self.raw(pred, ref, key)
        if mean:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(not_nan), 1.0)
        return loss


class PerAtomLoss(SimpleLoss):
    """Graph-level loss normalized by atom count (squared for MSE).

    Reference parity: loss.py:60-93.
    """

    def __call__(self, pred: dict, ref: dict, key: str, mean: bool = True):
        loss, not_nan = self.raw(pred, ref, key)
        N = ref["_n_nodes"].reshape(loss.shape[:-1] + (1,)).astype(loss.dtype)
        N = jnp.maximum(N, 1.0)
        loss = loss / N
        if self.func_name == "MSELoss":
            loss = loss / N
        if mean:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(not_nan), 1.0)
        return loss


class PerSpeciesLoss(SimpleLoss):
    """Average within each species, then across species.

    Reference parity: loss.py:96-157, with static num_segments: species ids
    are bucketed into a fixed-size bincount (max 200 types).
    """

    NUM_TYPES = 200

    def __call__(self, pred: dict, ref: dict, key: str, mean: bool = True):
        if not mean:
            raise NotImplementedError("PerSpeciesLoss requires mean=True")
        loss, not_nan = self.raw(pred, ref, key)
        per_atom = jnp.sum(loss, axis=tuple(range(1, loss.ndim)))
        weight = jnp.max(not_nan, axis=tuple(range(1, loss.ndim)))
        spe = pred["atom_types"].reshape(-1).astype(jnp.int32)
        import jax

        sums = jax.ops.segment_sum(per_atom, spe, num_segments=self.NUM_TYPES)
        counts = jax.ops.segment_sum(weight, spe, num_segments=self.NUM_TYPES)
        present = (counts > 0).astype(loss.dtype)
        per_species = sums / jnp.maximum(counts, 1.0)
        return jnp.sum(per_species * present) / jnp.maximum(
            jnp.sum(present), 1.0
        )


def find_loss_function(name, params):
    """Prefix dispatch: PerSpecies* / PerAtom* wrappers.

    Reference parity: loss.py:160-183.
    """
    wrapper_list = dict(perspecies=PerSpeciesLoss, peratom=PerAtomLoss)
    if isinstance(name, str):
        for key in wrapper_list:
            if name.lower().startswith(key):
                return wrapper_list[key](name[len(key):], params)
        return SimpleLoss(name, params)
    if inspect.isclass(name):
        return name(params) if params else name()
    if callable(name):
        return name
    raise NotImplementedError(f"{name} Loss is not implemented")


class Loss:
    """Coefficient-weighted multi-key loss.

    Reference parity: loss.py:186-287 (same coeff-spec grammar).
    """

    def __init__(self, coeffs: Union[dict, str, List[str]],
                 coeff_schedule: str = "constant"):
        self.coeff_schedule = coeff_schedule
        self.coeffs = {}
        self.funcs = {}
        self.keys = []
        mseloss = find_loss_function("MSELoss", {})
        if isinstance(coeffs, str):
            self.coeffs[coeffs] = 1.0
            self.funcs[coeffs] = mseloss
        elif isinstance(coeffs, (list, tuple)):
            for key in coeffs:
                self.coeffs[key] = 1.0
                self.funcs[key] = mseloss
        elif hasattr(coeffs, "items"):
            for key, value in coeffs.items():
                logging.debug(f" parsing {key} {value}")
                coeff, func, func_params = 1.0, "MSELoss", {}
                if isinstance(value, (float, int)):
                    coeff = value
                elif isinstance(value, str) or callable(value):
                    func = value
                elif isinstance(value, (list, tuple)):
                    if isinstance(value[0], (float, int)):
                        coeff = value[0]
                        if len(value) > 1:
                            func = value[1]
                        if len(value) > 2:
                            func_params = value[2]
                    else:
                        func = value[0]
                        if len(value) > 1:
                            func_params = value[1]
                else:
                    raise NotImplementedError(
                        f"expected float, list or tuple, got {type(value)}"
                    )
                self.coeffs[key] = coeff
                self.funcs[key] = find_loss_function(func, func_params)
        else:
            raise NotImplementedError(
                f"loss_coeffs can only be str, list and dict; got {type(coeffs)}"
            )
        for key, coeff in self.coeffs.items():
            self.coeffs[key] = float(coeff)
            self.keys.append(key)

    def __call__(self, pred: dict, ref: dict):
        loss = 0.0
        contrib = {}
        for key in self.coeffs:
            _loss = self.funcs[key](pred=pred, ref=ref, key=key, mean=True)
            contrib[key] = _loss
            loss = loss + self.coeffs[key] * _loss
        return loss, contrib


class RunningScalar:
    """Host-side running mean of device scalars; conversion deferred to
    result time so train steps stay async-dispatched."""

    def __init__(self):
        self.values = []

    def accumulate(self, value):
        self.values.append(value)
        return value

    def reset(self):
        self.values = []

    def current_result(self):
        if not self.values:
            return 0.0
        import jax.numpy as jnp

        # one device reduction + one transfer instead of per-batch floats
        return float(jnp.mean(jnp.stack([jnp.asarray(v) for v in self.values])))


class LossStat:
    """Accumulate total + per-key loss values across batches.

    Reference parity: loss.py:290-361.
    """

    def __init__(self, loss_instance=None):
        self.loss_stat = {"total": RunningScalar()}
        self.ignore_nan = {}
        if loss_instance is not None:
            for key, func in loss_instance.funcs.items():
                self.ignore_nan[key] = getattr(func, "ignore_nan", False)

    def __call__(self, loss, loss_contrib):
        # keep device scalars — never force a sync inside the train loop
        # (conversion happens lazily at logging/result time)
        results = {}
        self.loss_stat["total"].accumulate(loss)
        results["loss"] = loss
        for k, v in loss_contrib.items():
            if k not in self.loss_stat:
                self.loss_stat[k] = RunningScalar()
            self.loss_stat[k].accumulate(v)
            results["loss_" + k] = v
        return results

    def reset(self):
        for v in self.loss_stat.values():
            v.reset()

    def current_result(self):
        results = {
            "loss_" + k: v.current_result()
            for k, v in self.loss_stat.items()
            if k != "total"
        }
        results["loss"] = self.loss_stat["total"].current_result()
        return results
