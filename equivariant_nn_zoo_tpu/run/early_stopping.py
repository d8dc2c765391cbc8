"""Early stopping: patience-on-metric plus lower/upper bounds.

Reference parity: e3_layers/run/early_stopping.py (C19 in SURVEY.md §2) —
same three conditions and state_dict semantics for resume.
"""

from __future__ import annotations

from collections import OrderedDict
from copy import deepcopy
from typing import Mapping


class EarlyStopping:
    def __init__(
        self,
        lower_bounds: dict = {},
        upper_bounds: dict = {},
        patiences: dict = {},
        delta: dict = {},
        cumulative_delta: bool = False,
    ):
        self.patiences = deepcopy(dict(patiences))
        self.lower_bounds = deepcopy(dict(lower_bounds))
        self.upper_bounds = deepcopy(dict(upper_bounds))
        self.cumulative_delta = cumulative_delta

        self.delta = {}
        self.counters = {}
        self.minimums = {}
        for key, pat in self.patiences.items():
            self.patiences[key] = int(pat)
            self.counters[key] = 0
            self.minimums[key] = None
            self.delta[key] = delta.get(key, 0.0)
            if pat < 1:
                raise ValueError(
                    f"Argument patience for {key} should be positive integer."
                )
            if self.delta[key] < 0.0:
                raise ValueError("Argument delta should not be a negative number.")
        for key in self.delta:
            if key not in self.patiences:
                raise ValueError(f"patience for {key} should be defined")

    def __call__(self, metrics):
        stop = False
        stop_args = "Early stopping:"
        debug_args = None

        for key, pat in self.patiences.items():
            value = metrics[key]
            minimum = self.minimums[key]
            delta = self.delta[key]
            if minimum is None:
                self.minimums[key] = value
            elif value >= (minimum - delta):
                if not self.cumulative_delta and value > minimum:
                    self.minimums[key] = value
                self.counters[key] += 1
                debug_args = f"EarlyStopping: {self.counters[key]} / {pat}"
                if self.counters[key] >= pat:
                    stop_args += f" {key} has not reduced for {pat} epochs"
                    stop = True
            else:
                self.minimums[key] = value
                self.counters[key] = 0

        for key, bound in self.lower_bounds.items():
            if metrics[key] < bound:
                stop_args += f" {key} is smaller than {bound}"
                stop = True
        for key, bound in self.upper_bounds.items():
            if metrics[key] > bound:
                stop_args += f" {key} is larger than {bound}"
                stop = True
        return stop, stop_args, debug_args

    def state_dict(self):
        return OrderedDict(
            [("counters", self.counters), ("minimums", self.minimums)]
        )

    def load_state_dict(self, state_dict: Mapping):
        self.counters = dict(state_dict["counters"])
        self.minimums = dict(state_dict["minimums"])
