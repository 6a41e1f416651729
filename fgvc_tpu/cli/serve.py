#!/usr/bin/env python
"""Serving entry point: the tracker behind an HTTP endpoint.

The reference has no serving story (its deployment artifact is "run
tools/test.py"); this is the production-shaped counterpart to the StableHLO
export (core/export.py): one warm process owns the compiled propagation
program and answers tracking requests over HTTP.

    fgvc-serve --checkpoint ckpt.pth --port 8500 &
    # request: npz with video (T,H,W,3) uint8 RGB + query_points (P,3)
    #          (t, x, y) in input pixels
    curl -s -X POST --data-binary @req.npz localhost:8500/v1/track | jq .

Endpoints:
  POST /v1/track   — body: .npz {video, query_points}; reply: JSON
                     {trajectories: (T,P,2), visibilities: (T,P), ms}
  POST /v1/vos     — body: .npz {video, first_mask}; reply: JSON
                     {masks: (T,H,W) int labels, num_objects, ms}
  GET  /healthz    — liveness + config summary (200 once warm)
  GET  /stats      — request counter / cumulative frames / wall time

The first request pays the jit compile for its (frame-bucket, point-bucket)
shape; the buckets make repeats hit the cache (static shapes — the same
property the eval harness relies on).  One device today; scale-out is one
process per chip behind any HTTP load balancer (the model is ~11 M params —
replication, not sharding, is the right serving layout).
"""

from __future__ import annotations

import argparse
import io
import json
import time


def _resize_video(video, hw):
    """Host-side bilinear resize of (T,H,W,3) uint8 to the model
    resolution, same convention as datasets.tapvid._resize_video."""
    import cv2
    import numpy as np

    h, w = hw
    return np.stack(
        [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in video]
    )


def make_handler(tracker, stats):
    """Build the BaseHTTPRequestHandler class closed over a warm tracker.

    Requests at any resolution are resized host-side to the tracker's
    configured input_size (and query points / returned trajectories are
    scaled to match), so every request reuses the ONE warm compile — an
    untrusted client can never trigger a fresh propagation-scan jit (first
    compiles take minutes) or a Mosaic shape-alignment error."""
    import threading
    from http.server import BaseHTTPRequestHandler

    import numpy as np

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload, default=float).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", **stats["config"]})
            elif self.path == "/stats":
                self._reply(200, {
                    k: v for k, v in stats.items() if k != "config"
                })
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path == "/v1/vos":
                self._do_vos()
                return
            if self.path != "/v1/track":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                limit = stats["config"].get("max_request_mb", 512)
                if n > limit * (1 << 20):
                    self._reply(413, {
                        "error": f"request {n} bytes > max_request_mb="
                                 f"{limit} (server --max-request-mb)"
                    })
                    return
                blob = np.load(io.BytesIO(self.rfile.read(n)))
                video = np.asarray(blob["video"])
                pts = np.asarray(blob["query_points"], np.float32)
                if video.ndim != 4 or video.shape[-1] != 3:
                    raise ValueError(f"video must be (T,H,W,3), got {video.shape}")
                if pts.ndim != 2 or pts.shape[-1] != 3:
                    raise ValueError(
                        f"query_points must be (P,3) (t,x,y), got {pts.shape}"
                    )
                t0 = time.perf_counter()
                H, W = video.shape[1:3]
                ih, iw = tracker.cfg.input_size
                if (H, W) != (ih, iw):
                    if video.dtype != np.uint8:
                        raise ValueError(
                            f"video is {H}x{W} but the server runs at "
                            f"{ih}x{iw}; only uint8 RGB can be resized "
                            "host-side (float input is assumed "
                            "preprocessed at the model resolution)"
                        )
                    video = _resize_video(video, (ih, iw))
                    pts = pts.copy()
                    pts[:, 1] *= iw / W
                    pts[:, 2] *= ih / H
                out = tracker.track_points(video, pts)
                traj = np.asarray(out["trajectories"], np.float64)
                traj[..., 0] *= W / iw
                traj[..., 1] *= H / ih
                ms = 1e3 * (time.perf_counter() - t0)
                with lock:
                    stats["requests"] += 1
                    stats["frames"] += int(video.shape[0])
                    stats["track_ms"] += ms
                self._reply(200, {
                    "trajectories": traj.tolist(),
                    "visibilities": out["visibilities"].tolist(),
                    "ms": round(ms, 2),
                })
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

        def _do_vos(self):
            """Mask propagation: npz {video (T,H,W,3) uint8, first_mask
            (H,W) int labels} -> {masks: (T,H,W) int, num_objects, ms}.
            Masks come back at the CLIENT's resolution (decode_hw)."""
            try:
                n = int(self.headers.get("Content-Length", 0))
                limit = stats["config"].get("max_request_mb", 512)
                if n > limit * (1 << 20):
                    self._reply(413, {
                        "error": f"request {n} bytes > max_request_mb={limit}"
                    })
                    return
                blob = np.load(io.BytesIO(self.rfile.read(n)))
                video = np.asarray(blob["video"])
                mask0 = np.asarray(blob["first_mask"])
                if video.ndim != 4 or video.shape[-1] != 3:
                    raise ValueError(f"video must be (T,H,W,3), got {video.shape}")
                if mask0.shape != video.shape[1:3]:
                    raise ValueError(
                        f"first_mask {mask0.shape} must match frames "
                        f"{video.shape[1:3]}"
                    )
                t0 = time.perf_counter()
                H, W = video.shape[1:3]
                ih, iw = tracker.cfg.input_size
                if (H, W) != (ih, iw):
                    if video.dtype != np.uint8:
                        raise ValueError(
                            f"video is {H}x{W} but the server runs at "
                            f"{ih}x{iw}; only uint8 RGB can be resized"
                        )
                    video = _resize_video(video, (ih, iw))
                num_objects = int(mask0.max())
                masks = tracker.track_masks(
                    video, mask0.astype(np.uint8), (H, W), num_objects
                )
                ms = 1e3 * (time.perf_counter() - t0)
                with lock:
                    stats["requests"] += 1
                    stats["frames"] += int(video.shape[0])
                    stats["track_ms"] += ms
                self._reply(200, {
                    "masks": np.asarray(masks).tolist(),
                    "num_objects": num_objects,
                    "ms": round(ms, 2),
                })
            except Exception as e:  # noqa: BLE001
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def make_server(tracker, port: int, cfg_summary: dict):
    """(server, stats) on an ephemeral or fixed port; serve_forever() to run."""
    from http.server import ThreadingHTTPServer

    stats = {
        "requests": 0, "frames": 0, "track_ms": 0.0, "config": cfg_summary,
    }
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(tracker, stats)
    )
    return server, stats


def build_serve_cfg(args):
    """davis preset -> optional --config JSON -> explicitly passed flags.

    Serving defaults (applied only when neither the file nor a flag sets
    the knob): input_size 256², precision 'highest', visibility 'heatmap'
    — real visibility estimates are what a serving client wants."""
    import dataclasses
    import json

    from fgvc_tpu.apis.test import TASK_CONFIGS

    cfg = TASK_CONFIGS["davis"]
    file_keys = set()
    if args.config:
        from fgvc_tpu.config import config_from_file

        cfg = config_from_file(args.config, cfg)
        with open(args.config) as f:
            file_keys = set(json.load(f))
    over = {}
    if args.input_size is not None:
        over["input_size"] = (args.input_size, args.input_size)
    if args.precision:
        over["matmul_precision"] = args.precision
    if args.visibility_mode:
        over["visibility_mode"] = args.visibility_mode
    elif "visibility_mode" not in file_keys:
        over["visibility_mode"] = "heatmap"
    return dataclasses.replace(cfg, **over)


def main():
    p = argparse.ArgumentParser(description="serve the tracker over HTTP")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--backbone", default="resnet18_d1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--config", default=None,
                   help="JSON config file overlaid on the davis preset "
                        "(same knob names; explicit flags win)")
    p.add_argument("--input-size", type=int, default=None,
                   help="model resolution (default: file's, else 256)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument(
        "--precision", default=None,
        choices=["highest", "high", "default"],
        help="affinity matmul precision (default: file's, else highest)",
    )
    p.add_argument(
        "--visibility-mode", default=None, choices=["none", "heatmap"],
        help="serving defaults to real visibility estimates (heatmap) "
             "unless the config file or this flag says otherwise",
    )
    p.add_argument(
        "--max-request-mb", type=int, default=512,
        help="reject request bodies larger than this (413)",
    )
    args = p.parse_args()

    import jax

    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from fgvc_tpu.apis.test import build_tracker

    cfg = build_serve_cfg(args)
    tracker = build_tracker(cfg, args.checkpoint, backbone=args.backbone)

    # warm the compile caches with one tiny request-shaped pass so the
    # first real request doesn't pay the propagation-scan compile
    rng = np.random.default_rng(0)
    video = rng.integers(
        0, 256, (2, *cfg.input_size, 3), dtype=np.uint8
    )
    tracker.track_points(video, np.array([[0, 1.0, 1.0]], np.float32))

    summary = {
        "backbone": args.backbone,
        "input_size": cfg.input_size,
        "precision": cfg.matmul_precision,
        "platform": jax.default_backend(),
        "max_request_mb": args.max_request_mb,
    }
    server, _ = make_server(tracker, args.port, summary)
    print(f"serving on 127.0.0.1:{args.port} ({summary})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
