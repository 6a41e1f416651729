import numpy as np, jax, time
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
from fgvc_tpu.config import TestConfig
from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
from fgvc_tpu.models.tracker import Tracker

rng = np.random.default_rng(0)
T, H, W = 12, 256, 256
base = rng.integers(0, 256, (H+8, W+8, 3), dtype=np.uint8)
video = np.stack([base[i//2:i//2+H, i//2:i//2+W] for i in range(T)])
model = resnet18_d1()
variables = init_resnet_params(model, jax.random.PRNGKey(0), (H, W))
cfg = TestConfig(attention_impl="flow_guided", frame_bucket=4, point_bucket=8)
tr = Tracker(lambda v, x: model.apply(v, x, train=False), variables, cfg)
qp = np.array([[0, 128.0, 128.0], [0, 60.0, 200.0]], np.float32)
t0 = time.time()
out = tr.track_points(video, qp)
print("traj shape", out["trajectories"].shape, "wall", round(time.time()-t0,1), "s")
t0 = time.time()
out = tr.track_points(video, qp)
print("warm wall", round(time.time()-t0,1), "s")
print("frame-11 coords", out["trajectories"][11])
