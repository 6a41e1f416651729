import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Training-step throughput at the recipe's shapes, device-resident data."""
import time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from fgvc_tpu.config import TrainConfig
from fgvc_tpu.core.train import MixedTrainer

for B in (1, 4):
    cfg = TrainConfig(radius=24, crop_size=256, batch_size=B)
    tr = MixedTrainer(cfg)
    state, teacher, tx = tr.init(jax.random.PRNGKey(0), 1000)
    step = tr.make_train_step(tx)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = {
        "imgs": jax.random.normal(ks[0], (B, 2, 256, 256, 3)),
        "imgs_sup": jax.random.normal(ks[1], (B, 2, 256, 256, 3)),
        "flow": jax.random.normal(ks[2], (B, 256, 256, 2)) * 2,
        "flow_back": jax.random.normal(ks[3], (B, 256, 256, 2)) * 2,
    }
    state, losses = step(state, teacher, batch, jax.random.PRNGKey(2))
    float(losses["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, losses = step(state, teacher, batch, jax.random.PRNGKey(2))
    float(losses["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"B={B}: {dt*1e3:.1f} ms/step = {B/dt:.2f} samples/s")
