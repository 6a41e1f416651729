"""fgvc-serve: the HTTP tracking service end-to-end on an ephemeral port.

A warm tracker behind ThreadingHTTPServer answers /v1/track with the same
trajectories Tracker.track_points returns directly; /healthz and /stats
report liveness and counters; malformed requests get a 400 with the error.
"""

import dataclasses
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from fgvc_tpu.apis.test import TASK_CONFIGS, build_tracker
    from fgvc_tpu.cli.serve import make_server

    cfg = dataclasses.replace(
        TASK_CONFIGS["davis"],
        input_size=(24, 24),
        frame_bucket=4,
        point_bucket=8,
        neighbor_range=6,
        tile=8,
        visibility_mode="heatmap",
    )
    tracker = build_tracker(cfg)
    srv, stats = make_server(tracker, 0, {"backbone": "resnet18_d1"})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, stats, tracker
    srv.shutdown()


def _post_npz(port, video, pts, path="/v1/track"):
    buf = io.BytesIO()
    np.savez(buf, video=video, query_points=pts)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_track_endpoint_matches_direct_call(server):
    srv, stats, tracker = server
    port = srv.server_address[1]
    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (3, 24, 24, 3), dtype=np.uint8)
    pts = np.array([[0, 5.0, 7.0], [1, 12.0, 3.0]], np.float32)

    out = _post_npz(port, video, pts)
    traj = np.asarray(out["trajectories"], np.float32)
    vis = np.asarray(out["visibilities"], bool)
    assert traj.shape == (3, 2, 2) and vis.shape == (3, 2)
    direct = tracker.track_points(video, pts)
    np.testing.assert_allclose(traj, direct["trajectories"], atol=1e-5)
    assert out["ms"] > 0

    health = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60
        ).read()
    )
    assert health["status"] == "ok"
    st = json.loads(
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=60
        ).read()
    )
    assert st["requests"] >= 1 and st["frames"] >= 3


def test_offsize_video_is_resized_to_the_warm_compile(server):
    """A client at a different resolution must NOT trigger a fresh jit:
    the handler resizes host-side and scales points in / trajectories out,
    so coordinates stay in the CLIENT's pixel frame."""
    srv, _, tracker = server
    port = srv.server_address[1]
    rng = np.random.default_rng(2)
    video = rng.integers(0, 256, (3, 48, 96, 3), dtype=np.uint8)  # 2x/4x
    pts = np.array([[0, 40.0, 20.0]], np.float32)

    out = _post_npz(port, video, pts)
    traj = np.asarray(out["trajectories"], np.float32)
    assert traj.shape == (3, 1, 2)
    # frame 0 of the trajectory is the query point itself, in CLIENT coords
    np.testing.assert_allclose(traj[0, 0], [40.0, 20.0], atol=96 / 24)
    # all coords live in the client's pixel frame, not the model's 24x24
    assert (traj[..., 0] <= 96).all() and (traj[..., 1] <= 48).all()

    # equivalent direct call at model resolution, scaled out the same way
    from fgvc_tpu.cli.serve import _resize_video

    small = _resize_video(video, tracker.cfg.input_size)
    spts = pts.copy()
    spts[:, 1] *= 24 / 96
    spts[:, 2] *= 24 / 48
    direct = tracker.track_points(small, spts)["trajectories"].copy()
    direct[..., 0] *= 96 / 24
    direct[..., 1] *= 48 / 24
    np.testing.assert_allclose(traj, direct, atol=1e-4)


def test_offsize_float_video_is_rejected(server):
    srv, _, _ = server
    port = srv.server_address[1]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npz(
            port,
            np.zeros((2, 48, 48, 3), np.float32),
            np.zeros((1, 3), np.float32),
        )
    assert ei.value.code == 400
    assert "resized" in json.loads(ei.value.read())["error"]


def test_bad_request_is_a_400_not_a_crash(server):
    srv, _, _ = server
    port = srv.server_address[1]
    rng = np.random.default_rng(1)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npz(
            port,
            rng.integers(0, 256, (3, 24, 24), dtype=np.uint8),  # no channel
            np.zeros((1, 3), np.float32),
        )
    assert ei.value.code == 400
    assert "video must be" in json.loads(ei.value.read())["error"]
    # server still alive
    health = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=60
    )
    assert health.status == 200


def test_oversize_request_is_a_413(server):
    srv, stats, _ = server
    port = srv.server_address[1]
    stats["config"]["max_request_mb"] = 0  # force the limit for the test
    try:
        rng = np.random.default_rng(3)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_npz(
                port,
                rng.integers(0, 256, (2, 24, 24, 3), dtype=np.uint8),
                np.zeros((1, 3), np.float32),
            )
        assert ei.value.code == 413
        assert "max_request_mb" in json.loads(ei.value.read())["error"]
    finally:
        del stats["config"]["max_request_mb"]


def test_vos_endpoint_matches_direct_call(server):
    srv, _, tracker = server
    port = srv.server_address[1]
    rng = np.random.default_rng(4)
    video = rng.integers(0, 256, (3, 24, 24, 3), dtype=np.uint8)
    mask0 = np.zeros((24, 24), np.uint8)
    mask0[4:14, 6:18] = 1
    mask0[16:22, 2:8] = 2

    buf = io.BytesIO()
    np.savez(buf, video=video, first_mask=mask0)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/vos", data=buf.getvalue(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    masks = np.asarray(out["masks"])
    assert masks.shape == (3, 24, 24)
    assert out["num_objects"] == 2
    direct = tracker.track_masks(video, mask0, (24, 24), 2)
    np.testing.assert_array_equal(masks, direct)
    # frame 0 echoes the reference mask
    np.testing.assert_array_equal(masks[0], mask0)
