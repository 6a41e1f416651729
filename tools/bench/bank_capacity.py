"""Single-chip bank-capacity boundary at Kinetics shapes (round-5 task 5).

Bank-parallel propagation (`--bank-devices N`) exists for HBM CAPACITY
scaling — banks bigger than one chip.  Single-chip hardware means the
sharded path itself can only run on the CPU mesh, but the CLAIM that
motivates it is measurable on the one real chip: walk the video length T
upward through the unsharded bank-direct scan (the exact `kinetics`
bench section workload) until HBM is exhausted, and record the boundary.

Per-frame HBM at Kinetics shapes (128x128x256 f32 features, halo 15):
  feats      (T,128,128,256) f32 = 16.78 MB/frame  (caller-held input)
  bank_pad   (T,160,160,256) f32 = 26.21 MB/frame  (in-jit halo-padded)
  ------------------------------- ~43 MB/frame against ~16 GB HBM
so the predicted unsharded ceiling is ~350 frames; a 500-frame video
(~21.5 GB) cannot fit.  With `--bank-devices N` BOTH arrays are born
frame-sharded (models/tracker.py prepare_video + _scan_propagate_bank),
so the per-device footprint is ~43/N MB/frame + the replicated working
set.

Each size runs in a SUBPROCESS: a deterministic RESOURCE_EXHAUSTED (or a
worker crash from an allocation at the HBM edge) must not poison the
parent backend or the remaining sizes.  Results feed the capacity table
in docs/roofline.md ("Kinetics shapes / bank capacity").

Run from the repo root on TPU: python tools/bench/bank_capacity.py
"""

import json
import os
import subprocess
import sys

SIZES = [256, 288, 320, 352, 384, 416, 448, 512]

_CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, ".")
import dataclasses
from fgvc_tpu.config import KINETICS_TEST_CFG
from fgvc_tpu.models.tracker import Tracker, _bucket

Tk = int(sys.argv[1])
P = 32
# mirror bench.py kinetics(): bank built on-device, exact-f32 mode
cfg = dataclasses.replace(KINETICS_TEST_CFG, frame_bucket=32)
length = _bucket(Tk, 32)
bank = jax.random.normal(
    jax.random.PRNGKey(0), (length + 32, 128, 128, 256), jnp.float32
)
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(16, 240, (P, 2)), jnp.float32)
valid = jnp.ones((P,), bool)
tr = Tracker(lambda v, x: x, {}, cfg)
args = (bank, jnp.int32(0), pts, valid)
kw = dict(full_hw=(256, 256), length=length)
t0 = time.perf_counter()
float(jnp.sum(tr._track_group(*args, **kw)))  # compile + warm
warm_s = time.perf_counter() - t0
t0 = time.perf_counter()
float(jnp.sum(tr._track_group(*args, **kw)))
fps = (Tk - 1) / (time.perf_counter() - t0)
print("CAP" + json.dumps({
    "frames": Tk, "length": length, "ok": True,
    "bank_plus_pad_gb": round((length + 32) * (16.78 + 26.21) / 1024, 2),
    "fps": round(fps, 2), "warm_s": round(warm_s, 1),
}))
"""


def probe(frames: int) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", _CHILD, str(frames)],
        capture_output=True,
        timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
    )
    for line in r.stdout.decode().splitlines():
        if line.startswith("CAP"):
            return json.loads(line[3:])
    err = r.stderr.decode() + r.stdout.decode()
    oom_markers = ("Ran out of memory", "RESOURCE_EXHAUSTED")
    kind = "oom" if any(m in err for m in oom_markers) else "crash"
    # the XLA:TPU allocator's one-line summary ("Ran out of memory in
    # memory space hbm. Used X of Y hbm. Exceeded by Z.")
    detail = next(
        (
            l.split("Ran out of memory", 1)[-1].strip()
            for l in err.splitlines()
            if "Ran out of memory" in l
        ),
        err.strip().splitlines()[-1] if err.strip() else "no output",
    )
    return {"frames": frames, "ok": False, "kind": kind,
            "detail": detail[:300]}


def main():
    results = []
    ceiling = None
    for frames in SIZES:
        print(f"# probing T={frames} ...", file=sys.stderr, flush=True)
        res = probe(frames)
        results.append(res)
        print(json.dumps(res), flush=True)
        if res["ok"]:
            ceiling = frames
        else:
            break
    print(json.dumps({"single_chip_max_frames": ceiling, "results": results}))


if __name__ == "__main__":
    main()
