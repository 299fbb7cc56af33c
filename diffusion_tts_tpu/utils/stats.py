"""Training statistics: moment accumulation with cross-process reduction.

Counterpart of the reference's training_stats
(edm/torch_utils/training_stats.py:55-266): every report accumulates
[count, sum, sum-of-squares] per metric; a collector turns the moments into
mean/std. Metrics reported inside jit are plain arrays the caller passes
out of the compiled step. ``Collector.sync()`` is the reference's
``Collector.update()`` all_reduce (training_stats.py:233-266): it sums the
per-metric moment vectors across processes via
``multihost_utils.process_allgather`` (single-process: exact no-op). The
jsonl format matches the reference's stats.jsonl (training_loop.py:195-201).
"""
from __future__ import annotations

import json
import time
from collections import defaultdict
from typing import Any

import numpy as np


class Collector:
    """Accumulates [num, sum, sum^2] moments per metric between ticks."""

    def __init__(self):
        self._moments: dict[str, np.ndarray] = defaultdict(lambda: np.zeros(3))

    def report(self, name: str, value) -> None:
        v = np.asarray(value, np.float64).reshape(-1)
        v = v[np.isfinite(v)]
        if v.size:
            self._moments[name] += np.array([v.size, v.sum(), np.square(v).sum()])

    def report0(self, name: str, value) -> None:
        """Rank-0-only report (training_stats.py:102-108): only process 0
        contributes a value, but every process registers the name (the
        reference reports an empty list on other ranks) so sync()'s
        same-name-set contract holds."""
        import jax

        if jax.process_index() == 0:
            self.report(name, value)
        else:
            self._moments[name] += 0.0  # register with zero moments

    def mean(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        return float(m[1] / m[0])

    def std(self, name: str) -> float:
        m = self._moments.get(name)
        if m is None or m[0] == 0:
            return float("nan")
        mean = m[1] / m[0]
        var = max(m[2] / m[0] - mean**2, 0.0)
        return float(np.sqrt(var))

    def sync(self) -> None:
        """Sum moment vectors across processes (the reference's _sync
        all_reduce, training_stats.py:233-266). Every participating process
        must have reported the same metric-name set since the last sync —
        the same implicit contract the reference's per-name all_reduce has;
        mismatched names would desynchronize the collective order.
        Single-process: no-op."""
        import jax

        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        names = sorted(self._moments)
        if not names:
            return
        stacked = np.stack([self._moments[n] for n in names])  # [n_metrics, 3]
        gathered = np.asarray(multihost_utils.process_allgather(stacked))
        total = gathered.sum(axis=0)  # [n_metrics, 3]
        for i, name in enumerate(names):
            self._moments[name] = np.asarray(total[i], np.float64)

    def as_dict(self) -> dict[str, dict[str, float]]:
        return {
            k: {"num": int(m[0]), "mean": self.mean(k), "std": self.std(k)}
            for k, m in self._moments.items()
        }

    def reset(self) -> None:
        self._moments.clear()


class JsonlLogger:
    """stats.jsonl writer in the reference's format: one JSON object per
    tick with {metric: {num, mean, std}} plus a timestamp."""

    def __init__(self, path: str):
        self._f = open(path, "at")

    def write(self, collector: Collector, **extra: Any) -> None:
        rec = dict(collector.as_dict(), timestamp=time.time(), **extra)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


__all__ = ["Collector", "JsonlLogger"]
