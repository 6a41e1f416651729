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
