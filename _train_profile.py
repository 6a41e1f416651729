import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from fgvc_tpu.config import TrainConfig
from fgvc_tpu.core.train import MixedTrainer

cfg = TrainConfig(radius=24, crop_size=256, batch_size=1)
tr = MixedTrainer(cfg)
state, teacher, tx = tr.init(jax.random.PRNGKey(0), 10)
rng = np.random.default_rng(0)
batch = {
    "imgs": rng.standard_normal((1, 2, 256, 256, 3)).astype(np.float32),
    "imgs_sup": rng.standard_normal((1, 2, 256, 256, 3)).astype(np.float32),
    "flow": rng.standard_normal((1, 256, 256, 2)).astype(np.float32) * 3,
    "flow_back": rng.standard_normal((1, 256, 256, 2)).astype(np.float32) * 3,
}
fwd = jax.jit(lambda p, s, t, b, r: tr.loss_fn(p, s, t, b, r)[0])
key = jax.random.PRNGKey(1)
o = fwd(state.params, state.batch_stats, teacher, batch, key); float(o)
t0 = time.perf_counter()
for _ in range(3): o = fwd(state.params, state.batch_stats, teacher, batch, key)
float(o)
print(f"forward only: {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)

step = tr.make_train_step(tx)
state2, losses = step(state, teacher, batch, key)
jax.tree_util.tree_map(lambda x: x.block_until_ready(), losses)
float(losses["loss"])
t0 = time.perf_counter()
for _ in range(3):
    state2, losses = step(state2, teacher, batch, key)
float(losses["loss"])
print(f"full step: {(time.perf_counter()-t0)/3*1e3:.0f} ms", flush=True)
