import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from fgvc_tpu.apis.test import TASK_CONFIGS, build_tracker

cfg = TASK_CONFIGS["kinetics"]
tr = build_tracker(cfg)
rng = np.random.default_rng(0)
T, P = 250, 48  # Kinetics-scale video
video = rng.integers(0, 256, size=(T, 256, 256, 3), dtype=np.uint8)
qp = np.concatenate([np.zeros((P,1),np.float32), rng.uniform(16,240,(P,2)).astype(np.float32)], 1)
t0 = time.perf_counter()
out = tr.track_points(video, qp)
print(f"kinetics-scale T={T} P={P}: {time.perf_counter()-t0:.1f}s (incl. compile), finite={np.isfinite(out['trajectories']).all()}", flush=True)
t0 = time.perf_counter()
out = tr.track_points(video, qp)
dt = time.perf_counter()-t0
print(f"steady: {dt:.1f}s = {(T-1)/dt:.1f} frames/s", flush=True)
