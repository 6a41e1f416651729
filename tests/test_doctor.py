"""fgvc-doctor: bounded environment checks."""

import json
import subprocess
import sys
import os


def test_doctor_cpu_probe_and_report():
    from fgvc_tpu.cli.doctor import run_checks

    r = run_checks(probe_timeout=120, platform="cpu")
    assert r["ok"], r
    b = r["checks"]["backend"]
    assert b["platform"] == "cpu" and b["matmul_ok"]
    assert r["checks"]["compile_cache"]["ok"]
    assert "env" in r and r["env"]["jax"]


def test_doctor_cli_exit_codes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "fgvc_tpu.cli.doctor", "--platform", "cpu",
         "--probe-timeout", "120", "--json"],
        capture_output=True, text=True, timeout=200, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    rep = json.loads(out.stdout)
    assert rep["ok"] and rep["checks"]["backend"]["platform"] == "cpu"
