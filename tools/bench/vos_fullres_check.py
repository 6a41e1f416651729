import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
"""Full-res VOS save_mem check: 100 frames at (480, 880) without OOM."""
import dataclasses, time
import jax, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from fgvc_tpu.config import DAVIS_TEST_CFG
from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
from fgvc_tpu.models.tracker import Tracker

H, W, T = 480, 880, 100
cfg = dataclasses.replace(DAVIS_TEST_CFG, input_size=(H, W), save_mem=True, frame_bucket=50)
model = resnet18_d1()
variables = init_resnet_params(model, jax.random.PRNGKey(0), (H, W))
tr = Tracker(lambda v, x: model.apply(v, x, train=False), variables, cfg)
rng = np.random.default_rng(0)
video = rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8)
mask = np.zeros((H, W), np.uint8); mask[100:300, 200:500] = 1; mask[320:420, 600:800] = 2
t0 = time.time()
out = tr.track_masks(video, mask, (H, W), num_objects=2)
print("ok", out.shape, "uniques", np.unique(out).tolist(), f"{time.time()-t0:.1f}s total,"
      f" {(T-1)/(time.time()-t0):.2f} fps incl compile")
