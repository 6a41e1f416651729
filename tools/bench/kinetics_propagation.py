import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Kinetics-scale propagation: 250-frame HBM bank, pallas bank-direct."""
import time
import dataclasses
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from fgvc_tpu.config import KINETICS_TEST_CFG
from fgvc_tpu.models.tracker import Tracker, _bucket

cfg = dataclasses.replace(KINETICS_TEST_CFG, frame_bucket=32)
T, P = 250, 32
rng = np.random.default_rng(0)
# build the bank ON DEVICE (a 4.8 GB f32 upload through the tunnel would
# dominate; random device-side features time the same kernel work)
feats = jax.random.normal(
    jax.random.PRNGKey(0), (_bucket(T, 32) + 32, 128, 128, 256), jnp.float32
)
tracker = Tracker(lambda v, x: x, {}, cfg)
pts = jnp.asarray(rng.uniform(16, 240, (P, 2)), jnp.float32)
valid = jnp.ones((P,), bool)
args = (feats, jnp.int32(0), pts, valid)
kw = dict(full_hw=(256, 256), length=_bucket(T, 32))
float(jnp.sum(tracker._track_group(*args, **kw)))
for trial in range(3):
    t0 = time.perf_counter()
    float(jnp.sum(tracker._track_group(*args, **kw)))
    print(f"propagation-only {T} frames: {(T-1)/(time.perf_counter()-t0):.1f} fps")
