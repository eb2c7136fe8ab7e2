"""Per-stage wall timing.

The reference prints clock() deltas per phase
(/root/reference/SfM-GMS/SfM-GMS/FeatureMatchUtil.cpp:57-71). Here timings
are collected into a dict so callers/benchmarks can report them structurally.
`jax.block_until_ready` is applied so on-device async dispatch is measured
honestly.
"""
from __future__ import annotations

import time
from contextlib import contextmanager

import jax

stage_times: dict[str, float] = {}


class Timer:
    def __init__(self, sink: dict | None = None):
        self.sink = stage_times if sink is None else sink

    @contextmanager
    def stage(self, name: str, result_holder=None):
        t0 = time.perf_counter()
        yield
        if result_holder is not None:
            jax.block_until_ready(result_holder)
        self.sink[name] = time.perf_counter() - t0
