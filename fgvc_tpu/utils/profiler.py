"""Tracing / profiling utilities — the framework's observability layer.

The reference's only tracing is mmcv's IterTimerHook (time/data_time into
the log buffer, iter_based_runner.py:279) and an inline kernel timer
(local_attention.py:1254-1269).  This module goes further, TPU-aware:

  * PhaseTimer — named wall-clock phases with device sync at the
    boundaries (through the tunnel, `jax.block_until_ready` does not
    reliably sync; a scalar reduction transfer does — see CLAUDE.md), so
    per-phase times mean what they say.  JSONL export for dashboards.
  * trace() — context manager around jax.profiler.trace: writes an XPlane
    trace viewable in TensorBoard/XProf (device kernels + host timeline).
  * annotate() — jax.profiler.TraceAnnotation passthrough so eval/train
    phases show up as named spans inside the device trace.

Used by tools/test.py --profile and tools/train.py --profile.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


def _sync():
    """Force completion of all pending device work (tunnel-safe): a scalar
    computation enqueues behind pending work on the in-order stream and its
    host transfer returns only once everything before it ran."""
    import jax.numpy as jnp

    float(jnp.zeros(()).sum())


class PhaseTimer:
    """Accumulates wall-clock per named phase with device-synced edges.

    >>> pt = PhaseTimer()
    >>> with pt.phase("features"):
    ...     feats = extract(video)
    >>> pt.summary()   # {'features': {'total_s': ..., 'calls': ...}}
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        if self.sync:
            _sync()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                _sync()
            self.totals[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "calls": self.calls[k],
                "mean_ms": round(1e3 * self.totals[k] / self.calls[k], 3),
            }
            for k in self.totals
        }

    def dump_jsonl(self, path: str) -> None:
        with open(path, "a") as f:
            f.write(
                json.dumps({"ts": time.time(), "phases": self.summary()})
                + "\n"
            )

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        total = sum(self.totals.values()) or 1.0
        lines = ["phase                    total_s   calls   mean_ms   share"]
        for k, v in rows:
            lines.append(
                f"{k:<24} {v:7.3f} {self.calls[k]:7d} "
                f"{1e3 * v / self.calls[k]:9.2f} {100 * v / total:6.1f}%"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """Device+host trace via jax.profiler (TensorBoard 'profile' plugin /
    xprof).  No-op when logdir is falsy, so callers can thread a --profile
    flag straight through."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside the device trace (TraceAnnotation passthrough)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
