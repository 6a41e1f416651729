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


def test_untrimmed_sample_frames():
    """loading.py:261-313: fixed-interval clip centers, edges clipped."""
    from fgvc_tpu.datasets.video_decode import UntrimmedSampleFrames

    r = UntrimmedSampleFrames(clip_len=3, frame_interval=16)(
        {"total_frames": 40, "start_index": 0}
    )
    inds = r["frame_inds"].reshape(-1, 3)
    # centers at 8, 24 -> windows [7..9], [23..25]; num_clips = 2
    assert r["num_clips"] == 2
    np.testing.assert_array_equal(inds, [[7, 8, 9], [23, 24, 25]])
    # clip_len=1 degenerates to the centers themselves
    r1 = UntrimmedSampleFrames(clip_len=1, frame_interval=16)(
        {"total_frames": 40, "start_index": 2}
    )
    np.testing.assert_array_equal(r1["frame_inds"], [10, 26])


def test_dense_sample_frames_matches_reference_formula():
    """loading.py:317-380: test mode = evenly spread window starts with
    interval sample_range // num_clips; train mode = one random start."""
    from fgvc_tpu.datasets.video_decode import DenseSampleFrames

    num_frames, sample_range, num_clips, positions = 200, 64, 4, 10
    s = DenseSampleFrames(
        clip_len=2, frame_interval=1, num_clips=num_clips,
        sample_range=sample_range, num_sample_positions=positions,
        test_mode=True,
    )
    r = s({"total_frames": num_frames, "start_index": 0})
    # the reference's _get_test_clips, computed inline
    sample_position = max(1, 1 + num_frames - sample_range)
    interval = sample_range // num_clips
    starts = np.linspace(0, sample_position - 1, num=positions, dtype=int)
    base = np.arange(num_clips) * interval
    want_offsets = np.concatenate([(base + x) % num_frames for x in starts])
    got = r["frame_inds"].reshape(-1, 2)
    np.testing.assert_array_equal(got[:, 0], want_offsets)
    np.testing.assert_array_equal(got[:, 1], want_offsets + 1)

    # train mode: offsets share one window start, spaced by interval
    st = DenseSampleFrames(
        clip_len=1, frame_interval=1, num_clips=num_clips,
        sample_range=sample_range, seed=3,
    )
    rt = st({"total_frames": num_frames, "start_index": 0})
    offs = rt["frame_inds"]
    assert len(offs) == num_clips
    d = np.diff(offs % num_frames)
    assert np.all(d == interval)
    assert 0 <= offs[0] < sample_position


def test_video_decode_overreported_frame_count(tmp_path):
    """Container metadata often overreports frame counts; indices past
    the decodable range repeat the last frame (reference OpenCVDecode's
    None-walk, loading.py:1147-1152) unless out_of_range='error'."""
    import cv2
    import pytest

    from fgvc_tpu.datasets.video_decode import VideoDecode, decode_video

    rng = np.random.default_rng(9)
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    if not w.isOpened():
        pytest.skip("no mp4 encoder in this cv2 build")
    frames = [
        rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(3)
    ]
    for f in frames:
        w.write(f)
    w.release()

    # ask for two frames past the end
    r = VideoDecode()({"filename": path, "frame_inds": np.arange(5)})
    assert len(r["imgs"]) == 5
    np.testing.assert_array_equal(r["imgs"][3], r["imgs"][2])
    np.testing.assert_array_equal(r["imgs"][4], r["imgs"][2])

    with pytest.raises(IOError):
        VideoDecode(out_of_range="error")(
            {"filename": path, "frame_inds": np.arange(5)}
        )

    # decode_video: decodable count is authoritative, streaming resize
    v = decode_video(path, resize=(16, 12))
    assert v.shape == (3, 12, 16, 3)
