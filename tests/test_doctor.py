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


def test_force_platform_cpu_and_alias_fallback():
    """force_platform: literal names force directly; 'tpu' walks plugin
    aliases (the tunnel registers TPU hardware under 'axon' — forcing
    jax_platforms='tpu' alone fails there with 'no jellyfish device')."""
    import jax

    from fgvc_tpu.utils.env import _TPU_PLATFORM_ALIASES, force_platform

    force_platform("cpu")
    assert jax.default_backend() == "cpu"
    # the alias walk must try plain 'tpu' first (real pods) and include
    # the tunnel plugin name
    assert _TPU_PLATFORM_ALIASES[0] == "tpu"
    assert "axon" in _TPU_PLATFORM_ALIASES


def test_force_platform_tpu_subprocess_without_tpu():
    """In a CPU-only subprocess, force_platform('tpu') raises (not hangs)
    with every alias's failure recorded."""
    code = (
        "import os; os.environ.pop('JAX_PLATFORMS', None);\n"
        "from fgvc_tpu.utils.env import force_platform\n"
        "try:\n"
        "    force_platform('tpu')\n"
        "    print('FORCED-OK')\n"
        "except RuntimeError as e:\n"
        "    assert 'tpu' in str(e) and 'axon' in str(e), e\n"
        "    print('RAISED-AS-EXPECTED')\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # hide any TPU plugin from the subprocess so the walk exhausts
    env["JAX_PLATFORMS"] = ""
    env["PJRT_DEVICE"] = ""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=180, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    # either outcome is environment-dependent (a live tunnel may serve
    # TPU even here); what matters is bounded, non-crashing behavior
    assert out.stdout.strip() in ("FORCED-OK", "RAISED-AS-EXPECTED")
