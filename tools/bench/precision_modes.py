import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from fgvc_tpu.ops.pallas.topk_attention import fused_topk_attention
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((128,128,256)), jnp.float32)
k = jnp.asarray(rng.standard_normal((6,128,128,256)), jnp.float32)
v = jnp.asarray(rng.standard_normal((6,128,128,32)), jnp.float32)
outs = {}
for cd in ("float32", "high", "bfloat16"):
    f = lambda: fused_topk_attention(q, k, v, radius=15.0, temperature=0.07, topk=10, tile=16, compute_dtype=cd)
    o = f(); float(jnp.sum(o)); outs[cd] = np.asarray(o)
    t0=time.perf_counter()
    for _ in range(20): o=f()
    float(jnp.sum(o))
    print(f"{cd}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/frame")
print("high vs f32 max diff:", np.abs(outs["high"]-outs["float32"]).max())
print("bf16 vs f32 max diff:", np.abs(outs["bfloat16"]-outs["float32"]).max())
