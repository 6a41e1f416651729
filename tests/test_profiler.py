"""Profiling utilities (PhaseTimer / trace / annotate)."""

import json
import os


def test_phase_timer_accumulates_and_reports(tmp_path):
    import time

    from fgvc_tpu.utils.profiler import PhaseTimer

    pt = PhaseTimer(sync=False)
    for _ in range(3):
        with pt.phase("a"):
            time.sleep(0.01)
    with pt.phase("b"):
        time.sleep(0.002)
    s = pt.summary()
    assert s["a"]["calls"] == 3 and s["b"]["calls"] == 1
    assert s["a"]["total_s"] >= 0.03
    rep = pt.report()
    assert "a" in rep and "share" in rep

    path = str(tmp_path / "phases.jsonl")
    pt.dump_jsonl(path)
    rec = json.loads(open(path).read().strip())
    assert "phases" in rec and "a" in rec["phases"]


def test_phase_timer_device_sync_smoke():
    import jax.numpy as jnp

    from fgvc_tpu.utils.profiler import PhaseTimer, annotate

    pt = PhaseTimer(sync=True)
    with pt.phase("matmul"):
        with annotate("matmul-span"):
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    assert pt.summary()["matmul"]["calls"] == 1
    assert float(x[0, 0]) == 64.0


def test_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    from fgvc_tpu.utils.profiler import trace

    logdir = str(tmp_path / "prof")
    with trace(logdir):
        float(jnp.ones((8, 8)).sum())
    found = []
    for root, _, files in os.walk(logdir):
        found += [f for f in files if f.endswith((".pb", ".xplane.pb"))]
    assert found, "no trace files written"
    with trace(None):  # no-op path
        pass
