#!/usr/bin/env python
"""Environment doctor — is this machine ready to run fgvc_tpu?

The reference logs `collect_env` at train start
(/root/reference/tools/train.py:96-106); a production deployment needs the
same answer BEFORE launching hours of work, plus the failure modes specific
to this stack: an unreachable TPU backend (tunnel outages), a missing
native fgpack library, a cold compile cache. Everything that can hang is
probed in a bounded subprocess, so `fgvc-doctor` itself always returns.

    fgvc-doctor [--probe-timeout 60] [--json]

Exit code 0 when the compute backend responds, 1 when it does not.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_PROBE = """
import time
import jax, jax.numpy as jnp
if %PLATFORM%:
    # "tpu" may be served by an alternate plugin name (see
    # fgvc_tpu.utils.env.force_platform — inlined here because this probe
    # runs as a bare `python -c` subprocess)
    _p = %PLATFORM%
    _names = ("tpu", "axon") if _p == "tpu" else (_p,)
    for _i, _n in enumerate(_names):
        jax.config.update("jax_platforms", _n)
        try:
            if jax.devices()[0].platform == ("tpu" if _p == "tpu" else _n):
                break
        except RuntimeError:
            if _i == len(_names) - 1:
                raise
    else:
        # every candidate initialized but none identified as the requested
        # platform — mirror force_platform's refusal instead of silently
        # benchmarking whatever backend is configured
        raise RuntimeError("no platform candidate matched: %r" % (_names,))
t0 = time.perf_counter()
d = jax.devices()
x = jnp.ones((256, 256))
s = float(jnp.sum(x @ x))
t1 = time.perf_counter()
import numpy as np
h = np.ones((1 << 20,), np.uint8)  # 1 MiB host->device->host roundtrip
t2 = time.perf_counter()
back = np.asarray(jax.device_put(h))
t3 = time.perf_counter()
print(__import__("json").dumps({
    "platform": d[0].platform,
    "n_devices": len(d),
    "device": str(d[0]),
    "first_op_s": round(t1 - t0, 3),
    "transfer_MBps": round(2 / max(t3 - t2, 1e-9), 1),
    "matmul_ok": s == 256.0 * 256 * 256,
}))
"""


def run_checks(probe_timeout: float = 60.0, platform: str = None) -> dict:
    from fgvc_tpu.utils.env import collect_env

    report: dict = {"checks": {}}

    # 1. backend probe (bounded subprocess — a dead tunnel hangs any
    #    in-process device query; bench.py guards the same way)
    t0 = time.perf_counter()
    try:
        probe = _PROBE.replace("%PLATFORM%", repr(platform))
        out = subprocess.run(
            [sys.executable, "-c", probe],
            capture_output=True, text=True, timeout=probe_timeout,
        )
        if out.returncode == 0:
            report["checks"]["backend"] = {
                "ok": True, **json.loads(out.stdout.strip().splitlines()[-1])
            }
        else:
            report["checks"]["backend"] = {
                "ok": False, "error": out.stderr.strip()[-500:],
            }
    except subprocess.TimeoutExpired:
        report["checks"]["backend"] = {
            "ok": False,
            "error": f"no response in {probe_timeout:.0f}s — TPU tunnel "
                     "outage? (CPU fallback: --platform cpu on the CLIs)",
            "waited_s": round(time.perf_counter() - t0, 1),
        }

    # env collection is in-process and device-touching — only safe after a
    # healthy probe, and only on the platform the probe validated (an
    # in-process query of a DIFFERENT backend could still hang on a dead
    # tunnel)
    if report["checks"]["backend"]["ok"]:
        if platform:
            from fgvc_tpu.utils.env import force_platform

            force_platform(platform)
        report["env"] = collect_env()

    # 2. native fgpack library
    try:
        from fgvc_tpu.data_io import fgpack

        lib = fgpack._load()
        report["checks"]["fgpack_native"] = {
            "ok": lib is not None,
            "note": "C++ batch reader loaded" if lib is not None
            else "falling back to pure-python reads",
        }
    except Exception as e:  # noqa: BLE001
        report["checks"]["fgpack_native"] = {
            "ok": False,
            "error": str(e)[:200],
            "note": "pure-python fallback still works",
        }

    # 3. persistent compile cache
    cache = "/root/.cache/jax_comp_cache"
    entries = len(os.listdir(cache)) if os.path.isdir(cache) else 0
    report["checks"]["compile_cache"] = {
        "ok": True,
        "dir": cache,
        "entries": entries,
        "note": "cold (first compiles will be slow)" if entries == 0
        else "warm",
    }

    # 4. optional deps the CLIs gate on
    for mod in ("cv2", "torch", "orbax.checkpoint", "tensorboardX"):
        try:
            __import__(mod)
            report["checks"][mod] = {"ok": True}
        except Exception:  # noqa: BLE001
            report["checks"][mod] = {
                "ok": False, "note": "optional — related features gate off",
            }

    report["ok"] = report["checks"]["backend"]["ok"]
    return report


def main():
    p = argparse.ArgumentParser(description="fgvc_tpu environment doctor")
    p.add_argument("--probe-timeout", type=float, default=60.0)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="probe a specific backend (default: the plugin's)")
    p.add_argument("--json", action="store_true", help="machine-readable")
    args = p.parse_args()

    report = run_checks(args.probe_timeout, platform=args.platform)
    if args.json:
        print(json.dumps(report, indent=2))
    else:
        for name, chk in report["checks"].items():
            mark = "ok " if chk.get("ok") else "FAIL"
            extra = {
                k: v for k, v in chk.items() if k not in ("ok",)
            }
            print(f"[{mark}] {name}: {extra}")
        for k, v in report.get("env", {}).items():
            print(f"      {k}: {v}")
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
