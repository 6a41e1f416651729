import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Per-frame attention-step microbench at DAVIS shapes on the real TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fgvc_tpu.ops.windowed_attention import masked_topk_attention_tiled, pad_key_bank

h = w = 128; C = 256; P = 32; Tk = 6; radius = 15.0; tile = 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((h, w, C)), jnp.float32)
k = jnp.asarray(rng.standard_normal((Tk, h, w, C)), jnp.float32)
v = jnp.asarray(rng.standard_normal((Tk, h, w, P)), jnp.float32)
kv = jnp.ones((Tk,), bool)

def timeit(f, *a, n=20, **kw):
    f(*a, **kw).block_until_ready()
    # force full sync through tunnel
    float(jnp.sum(f(*a, **kw)))
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a, **kw)
    float(jnp.sum(o))
    return (time.perf_counter() - t0) / n * 1e3

for impl in ("exact", "certified", "approx"):
    for prec in ("highest", "high", "default"):
        ms = timeit(masked_topk_attention_tiled, q, k, v,
                    radius=radius, temperature=0.07, topk=10, tile=tile,
                    key_valid=kv, precision=prec, topk_impl=impl)
        print(f"impl={impl:9s} prec={prec:8s} {ms:6.2f} ms/frame")

from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention
for cd in ("float32", "bfloat16"):
    ms = timeit(fused_topk_attention, q, k, v,
                radius=radius, temperature=0.07, topk=10, tile=16,
                key_valid=kv, compute_dtype=cd)
    print(f"pallas-v2 tile=16 dtype={cd:9s} {ms:6.2f} ms/frame")
