"""Video-file decoding pipeline (mmaction loading.py equivalents)."""

import numpy as np
import pytest


def test_sample_frames_train_and_test_modes():
    from fgvc_tpu.datasets.video_decode import SampleFrames

    # test mode is deterministic: offsets at avg/2 (loading.py:181-196)
    sf = SampleFrames(clip_len=4, frame_interval=2, num_clips=3,
                      test_mode=True)
    r = sf({"total_frames": 40, "start_index": 0})
    assert r["frame_inds"].shape == (12,)
    inds = r["frame_inds"].reshape(3, 4)
    # within each clip: stride = frame_interval
    assert np.all(np.diff(inds, axis=1) == 2)
    assert inds.max() < 40

    # train mode: random but in-range, reproducible by seed
    a = SampleFrames(4, 2, 3, seed=0)({"total_frames": 40})["frame_inds"]
    b = SampleFrames(4, 2, 3, seed=0)({"total_frames": 40})["frame_inds"]
    assert np.array_equal(a, b)
    assert a.max() < 40 and a.min() >= 0

    # short video loops (out_of_bound_opt='loop', loading.py:231)
    r = SampleFrames(8, 1, 1, seed=1)({"total_frames": 5})
    assert r["frame_inds"].max() < 5

    # twice_sample doubles the clips (TSM test protocol)
    r = SampleFrames(4, 1, 2, twice_sample=True, test_mode=True)(
        {"total_frames": 40}
    )
    assert r["frame_inds"].shape == (16,)


def test_raw_frame_decode(tmp_path):
    import cv2

    from fgvc_tpu.datasets.video_decode import RawFrameDecode, SampleFrames

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (6, 16, 20, 3), dtype=np.uint8)
    for i, f in enumerate(frames):
        cv2.imwrite(str(tmp_path / f"img_{i:05}.png"), f[..., ::-1])

    r = {"frame_dir": str(tmp_path), "total_frames": 6, "start_index": 0}
    r = SampleFrames(clip_len=3, num_clips=1, test_mode=True)(r)
    r = RawFrameDecode(filename_tmpl="img_{:05}.png")(r)
    assert len(r["imgs"]) == 3
    assert r["original_shape"] == (16, 20)
    for img, idx in zip(r["imgs"], r["frame_inds"]):
        np.testing.assert_array_equal(img, frames[idx])  # png = lossless RGB


def test_video_decode_mp4(tmp_path):
    import cv2

    from fgvc_tpu.datasets.video_decode import (
        SampleFrames,
        VideoDecode,
        VideoInit,
    )

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24)
    )
    if not w.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    # frame i is a solid gray level -> decoded identity is checkable
    levels = [20, 60, 100, 140, 180, 220]
    for lv in levels:
        w.write(np.full((24, 32, 3), lv, np.uint8))
    w.release()

    r = {"filename": path}
    r = VideoInit()(r)
    assert r["total_frames"] == 6
    r = SampleFrames(clip_len=3, frame_interval=2, num_clips=1,
                     test_mode=True)(r)
    r = VideoDecode()(r)
    assert len(r["imgs"]) == 3
    for img, idx in zip(r["imgs"], r["frame_inds"]):
        assert abs(int(img.mean()) - levels[idx]) < 6  # lossy codec slack
