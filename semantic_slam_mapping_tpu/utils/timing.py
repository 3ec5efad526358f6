"""Per-stage timing + counters.

Replaces the reference's ad-hoc boost::timer / cv::getTickCount prints
(reference: exp_mapping.cpp:39, run_tracker.cpp:35-48, vo.cpp:25-38,
quadmatcher.cpp:375-414, pose_graph.cpp:249-282, mapper.cpp:111-162) with a
structured registry whose summaries are machine-readable. Device work is
asynchronous under JAX — wrap the timed region's output in
``jax.block_until_ready`` (the ``block`` argument) or timings lie.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Dict, Optional

import jax


class StageTimer:
    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.max: Dict[str, float] = defaultdict(float)
        self.counters: Dict[str, float] = defaultdict(float)

    @contextmanager
    def stage(self, name: str, block: Any = None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("out", block)
            if out is not None:
                jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.max[name] = max(self.max[name], dt)
            self.count[name] += 1

    def add(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": self.total[name], "calls": self.count[name],
                   "mean_ms": 1e3 * self.total[name] / max(self.count[name], 1),
                   "max_ms": 1e3 * self.max[name]}
            for name in self.total
        }

    def report(self) -> str:
        lines = [f"{name:24s} {s['calls']:5d} calls  "
                 f"{s['mean_ms']:8.2f} ms/call  {s['max_ms']:8.0f} max  "
                 f"{s['total_s']:7.2f} s total"
                 for name, s in sorted(self.summary().items())]
        lines += [f"{k:24s} {v:g}" for k, v in sorted(self.counters.items())]
        return "\n".join(lines)
