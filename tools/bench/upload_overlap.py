"""Dispatch-order experiment: does the next video's host→device upload
hide behind the current video's propagation scan?

The eval loop (apis/test.py eval_tapvid) dispatches upload+features of
video i+1 BEFORE track_points of video i.  On an in-order device queue the
scan then sits BEHIND the upload+backbone of the next video; enqueueing
the scan FIRST (track_points_dispatch → load → collect) lets the transfer
stream while the device propagates.  Measures both orders.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from fgvc_tpu.config import DAVIS_TEST_CFG
from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
from fgvc_tpu.models.tracker import Tracker


def main(mode="f32"):
    if mode == "bf16":
        cfg = dataclasses.replace(
            DAVIS_TEST_CFG, matmul_precision="default", upload_format="yuv420"
        )
    else:
        cfg = DAVIS_TEST_CFG
    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(0), cfg.input_size)
    tracker = Tracker(lambda v, x: model.apply(v, x, train=False), variables, cfg)

    T, P = 64, 32
    rng = np.random.default_rng(0)
    videos = [
        rng.integers(0, 256, size=(T, *cfg.input_size, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    qp = np.concatenate(
        [np.zeros((P, 1), np.float32),
         rng.uniform(16, 240, size=(P, 2)).astype(np.float32)], axis=1
    )

    out = tracker.track_points(videos[0], qp)  # compile
    jax.block_until_ready(jnp.zeros(()))

    def sweep_upload_first():
        t0 = time.perf_counter()
        nxt = tracker._features_padded(videos[0])
        for i, v in enumerate(videos):
            feats = nxt
            nxt = (tracker._features_padded(videos[i + 1])
                   if i + 1 < len(videos) else None)
            out = tracker.track_points(v, qp, feats=feats)
        return len(videos) * (T - 1) / (time.perf_counter() - t0)

    def sweep_scan_first():
        t0 = time.perf_counter()
        nxt = tracker._features_padded(videos[0])
        for i, v in enumerate(videos):
            feats = nxt
            dp = tracker.track_points_dispatch(v, qp, feats=feats)
            nxt = (tracker._features_padded(videos[i + 1])
                   if i + 1 < len(videos) else None)
            out = tracker.track_points_collect(dp)
        return len(videos) * (T - 1) / (time.perf_counter() - t0)

    def sweep_no_upload():
        # features for all videos preloaded: the pure device-side loop
        pre = [tracker._features_padded(v) for v in videos]
        # block_until_ready does not reliably sync through the tunnel —
        # force each upload to completion with a host-side reduction
        for leaf in jax.tree_util.tree_leaves(pre):
            float(jnp.sum(leaf))
        t0 = time.perf_counter()
        for v, feats in zip(videos, pre):
            out = tracker.track_points(v, qp, feats=feats)
        return len(videos) * (T - 1) / (time.perf_counter() - t0)

    for name, fn in [("upload_first", sweep_upload_first),
                     ("scan_first", sweep_scan_first),
                     ("preloaded", sweep_no_upload)]:
        fn()  # warm
        runs = [fn() for _ in range(5)]
        print(f"{mode} {name:13s}: {np.median(runs):7.2f} fps  "
              f"(runs {[round(r,1) for r in runs]})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "f32")
