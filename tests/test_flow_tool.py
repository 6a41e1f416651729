"""tools/data/precompute_flow.py + the .flo IO it writes."""

import glob
import os
import subprocess
import sys

import numpy as np


def test_flo_roundtrip(tmp_path):
    from fgvc_tpu.data_io.flo import read_flo, write_flo

    rng = np.random.default_rng(0)
    flow = rng.standard_normal((7, 5, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)

    import pytest

    with pytest.raises(ValueError, match="magic"):
        (tmp_path / "bad.flo").write_bytes(b"nope")
        read_flo(str(tmp_path / "bad.flo"))


def test_precompute_flow_tool(tmp_path):
    """End-to-end on a 2-video/3-frame synthetic tree (random-init RAFT)."""
    import cv2

    rng = np.random.default_rng(1)
    root = tmp_path / "frames"
    for vid in ("v0", "v1"):
        d = root / vid
        d.mkdir(parents=True)
        for t in range(3):
            cv2.imwrite(
                str(d / f"{t:05d}.jpg"),
                rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
            )
    out = tmp_path / "flows"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "tools/data/precompute_flow.py"),
            "--frames-root", str(root), "--out", str(out),
            "--iters", "2", "--platform", "cpu",
        ],
        capture_output=True, text=True, timeout=560, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    from fgvc_tpu.data_io.flo import read_flo

    for vid in ("v0", "v1"):
        files = sorted(glob.glob(str(out / vid / "*.flo")))
        # 2 pairs x {forward, backward}
        assert len(files) == 4, files
        names = {os.path.basename(f) for f in files}
        assert names == {
            "forward_00000.flo", "backward_00000.flo",
            "forward_00001.flo", "backward_00001.flo",
        }
        for f in files:
            flow = read_flo(f)
            assert flow.shape == (32, 32, 2) and np.isfinite(flow).all()
