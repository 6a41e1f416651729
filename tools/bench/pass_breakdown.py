"""Per-pass timing of the fused top-k attention kernel at DAVIS shapes.

Times debug-cut kernels (debug_passes='a' / 'ab' / 'abc') per precision
mode — the measurement behind docs/roofline.md.  Differences give:
  pass A  = affinity matmuls + key DMA
  pass B  = 'ab' − 'a'  (distinct-value top-k rounds on the VPU)
  pass C  = 'abc' − 'ab' (value matmuls + value DMA)
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((128, 128, 256)), jnp.float32)
k = jnp.asarray(rng.standard_normal((6, 128, 128, 256)), jnp.float32)
v = jnp.asarray(rng.standard_normal((6, 128, 128, 32)), jnp.float32)

REPS = int(os.environ.get("REPS", "20"))

for cd in ("float32", "high", "bfloat16"):
    times = {}
    for passes in ("a", "ab", "abc"):
        def f():
            return fused_topk_attention(
                q, k, v, radius=15.0, temperature=0.07, topk=10, tile=16,
                compute_dtype=cd, debug_passes=passes,
            )

        o = f()
        float(jnp.sum(o))  # forced sync (block_until_ready unreliable here)
        t0 = time.perf_counter()
        for _ in range(REPS):
            o = f()
        float(jnp.sum(o))
        times[passes] = (time.perf_counter() - t0) / REPS * 1e3
    print(
        f"{cd:9s}: A {times['a']:6.2f}  B {times['ab'] - times['a']:6.2f}  "
        f"C {times['abc'] - times['ab']:6.2f}  total {times['abc']:6.2f} ms/frame"
    )
