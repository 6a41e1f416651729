"""Benchmark: label-propagation throughput (frames/sec/chip) on the DAVIS
eval workload.

Measures the end-to-end hot path of TAP-Vid-DAVIS inference — ResNet-18-d1
feature extraction + per-frame top-k masked-attention propagation at the
reference's exact settings (256×256 input, stride-2 features, key window =
first frame + 5 preceding, topk=10, temperature=0.07, neighbor_range=30;
/root/reference/configs/eval/res18_d1_eval.py:12) on synthetic DAVIS-shaped
videos, through the SAME pipelined video loop the eval harness runs
(apis/test.py eval_tapvid — next video's upload + features overlap the
current propagation).  `single_video_fps` is the unpipelined latency
figure; `propagation_only_fps` isolates the scan.

Baseline: the reference publishes no throughput (README only notes 4×A100-80G
and the `step` memory/speed dial).  We estimate the reference GPU hot loop at
~20 propagated frames/sec/A100: 6 key frames × (16384×16384×256) f32 einsum
≈ 412 GFLOP/frame plus top-k over 98k keys, at a realistic 8-10 TFLOP/s
effective f32 → ≈50 ms/frame.  vs_baseline = our fps / 20.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the propagation scan takes minutes to
# compile; cache it across bench invocations.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_FPS_ESTIMATE = 20.0

# last successful on-chip measurement (embedded in the outage error record
# so a tunnel-down run still carries the most recent real numbers)
_LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_last_good.json")


def wait_for_backend(max_wait_s: float = 1800.0) -> None:
    """The v5e chip sits behind a shared tunnel that occasionally drops
    (backend init then raises UNAVAILABLE or hangs).  Probe it in a
    SUBPROCESS — a failed init can poison the parent's backend cache —
    and wait for recovery up to FGVC_BENCH_BACKEND_WAIT seconds before
    emitting an honest error record (value 0) instead of hanging the
    bench harness."""
    import os
    import subprocess
    import sys

    max_wait_s = float(os.environ.get("FGVC_BENCH_BACKEND_WAIT", max_wait_s))
    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    # assert the platform: a CPU fallback must NOT count
                    # as recovery of the TPU this bench measures
                    "import jax; assert jax.devices()[0].platform == 'tpu'",
                ],
                timeout=150,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    print(
                        f"# backend recovered after {time.time() - t0:.0f}s",
                        file=sys.stderr,
                    )
                return
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > max_wait_s:
            err = {
                "metric": "davis_propagation_frames_per_sec_per_chip",
                "value": 0.0,
                "unit": "frames/s",
                "vs_baseline": 0.0,
                "error": (
                    "TPU backend unavailable for "
                    f"{waited:.0f}s (tunnel outage) — no "
                    "measurement possible this run"
                ),
            }
            try:
                with open(_LAST_GOOD_PATH) as f:
                    err["last_good_on_chip"] = json.load(f)
            except (OSError, ValueError):
                err["error"] += (
                    "; see BENCH_r02.json/README for the last "
                    "recorded numbers"
                )
            print(json.dumps(err))
            sys.exit(1)
        print(
            f"# backend unavailable (attempt {attempt}, {waited:.0f}s) — "
            "retrying in 30s",
            file=sys.stderr,
        )
        time.sleep(30)


def main():
    wait_for_backend()
    import dataclasses

    from fgvc_tpu.config import DAVIS_TEST_CFG
    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
    from fgvc_tpu.models.tracker import Tracker

    # Headline mode: pallas bf16 affinity + YUV420 upload — both promoted
    # by the synthetic accuracy study (docs/precision_study.md: Δ<D −0.11
    # for bf16, +0.07 for yuv420, bar 0.5); the f32-exact/RGB parity mode
    # is measured alongside (exact_mode_fps).  YUV420 halves the
    # host→device bytes (the tunnel is the e2e bottleneck; see
    # tunnel_MBps below).
    cfg = dataclasses.replace(
        DAVIS_TEST_CFG, matmul_precision="default", upload_format="yuv420"
    )
    cfg_exact = DAVIS_TEST_CFG
    model = resnet18_d1()
    variables = init_resnet_params(model, jax.random.PRNGKey(0), cfg.input_size)

    tracker = Tracker(
        lambda v, x: model.apply(v, x, train=False), variables, cfg
    )
    tracker_exact = Tracker(
        lambda v, x: model.apply(v, x, train=False), variables, cfg_exact
    )

    T, P = 64, 32  # DAVIS-like video length / point count
    rng = np.random.default_rng(0)
    # raw uint8 RGB frames — preprocessing (RGB→Lab+normalize) runs on device
    videos = [
        rng.integers(0, 256, size=(T, *cfg.input_size, 3), dtype=np.uint8)
        for _ in range(4)
    ]
    query_points = np.concatenate(
        [
            np.zeros((P, 1), np.float32),
            rng.uniform(16, 240, size=(P, 2)).astype(np.float32),
        ],
        axis=1,
    )

    # warmup (compile)
    out = tracker.track_points(videos[0], query_points)
    jax.block_until_ready(jnp.zeros(()))

    # END-TO-END = the eval harness's pipelined video loop (apis/test.py
    # eval_tapvid), SCAN-FIRST dispatch order: video i's propagation is
    # enqueued BEFORE video i+1's upload + features, so the transfer
    # streams behind the scan on the in-order device queue (measured +18
    # fps in the f32 mode — tools/bench/upload_overlap.py).  This is the
    # throughput `tools/test.py` delivers on a dataset.  Measured over 4
    # videos, median of 5 sweeps.
    def pipelined_sweep(tr):
        t0 = time.perf_counter()
        nxt = tr._features_padded(videos[0])
        for i, v in enumerate(videos):
            feats = nxt
            dp = tr.track_points_dispatch(v, query_points, feats=feats)
            nxt = (
                tr._features_padded(videos[i + 1])
                if i + 1 < len(videos)
                else None
            )
            out = tr.track_points_collect(dp)
        return out, len(videos) * (T - 1) / (time.perf_counter() - t0)

    out, _ = pipelined_sweep(tracker)  # warm the prefetch path
    runs = []
    for _ in range(5):
        out, f = pipelined_sweep(tracker)
        runs.append(f)
    fps = float(np.median(runs))

    # single-video latency figure (no cross-video pipelining)
    sv_runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = tracker.track_points(videos[0], query_points)
        sv_runs.append((T - 1) / (time.perf_counter() - t0))
    sv_fps = float(np.median(sv_runs))

    assert np.all(np.isfinite(out["trajectories"])), "non-finite trajectories"

    # tunnel-bandwidth probe: the e2e-vs-propagation gap is host→device
    # upload through the shared tunnel (196 KB/frame of uint8); production
    # TPU hosts move this over local PCIe/DMA at GB/s.  Median of 3.
    up = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jnp.asarray(videos[0])
        float(jnp.sum(d.astype(jnp.float32)))
        up.append(time.perf_counter() - t0)
    up_s = float(np.median(up))
    mb = videos[0].nbytes / 1e6

    # f32-exact parity mode, pipelined (same loop as the headline).
    # 5 sweeps like the headline: tunnel congestion makes 3-sweep medians
    # swing ±5 fps run-to-run.
    pipelined_sweep(tracker_exact)  # warm
    exact_fps = float(
        np.median([pipelined_sweep(tracker_exact)[1] for _ in range(5)])
    )

    # 'high' mode: explicit bf16x3 affinity/value matmuls (Δ<D −0.009 in
    # the study — an order tighter than the bf16 headline) — the fast
    # parity-grade option if real data ever rejects the bf16 promotion
    tracker_high = Tracker(
        lambda v, x: model.apply(v, x, train=False),
        variables,
        dataclasses.replace(cfg_exact, matmul_precision="high"),
    )
    pipelined_sweep(tracker_high)  # warm
    high_fps = float(
        np.median([pipelined_sweep(tracker_high)[1] for _ in range(5)])
    )
    del tracker_high

    # propagation-only: features precomputed, single query group, no host
    # transfers in the loop — isolates the attention+decode scan
    feats = tracker._features_padded(videos[0])
    pts = jnp.asarray(query_points[:, 1:])
    valid = jnp.ones((query_points.shape[0],), bool)
    args = (feats, jnp.int32(0), pts, valid)
    kw = dict(full_hw=cfg.input_size, length=T)
    float(jnp.sum(tracker._track_group(*args, **kw)))  # warm + sync
    prop_runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(tracker._track_group(*args, **kw)))
        prop_runs.append((T - 1) / (time.perf_counter() - t0))
    prop_fps = float(np.median(prop_runs))

    # Kinetics-scale regression point: 250-frame video → ~5 GB f32 HBM
    # feature bank, bank-direct Pallas propagation (the large-bank path
    # tools/bench/kinetics_propagation.py studies).  The bank is built
    # on-device (a 4.8 GB upload through the tunnel would swamp the
    # measurement; the kernel work is identical on random features).
    # Free the DAVIS-phase device arrays first: bank (4.8 GB) + the
    # in-jit query-group slice (4.3 GB) barely fit 16 GB HBM next to the
    # resident executables — the leftover DAVIS feature bank tips it over.
    import gc

    del feats, args
    out = None
    gc.collect()

    from fgvc_tpu.config import KINETICS_TEST_CFG
    from fgvc_tpu.models.tracker import _bucket

    kcfg_exact = dataclasses.replace(KINETICS_TEST_CFG, frame_bucket=32)
    kcfg = dataclasses.replace(kcfg_exact, matmul_precision="default")
    Tk = 250
    kbank = jax.random.normal(
        jax.random.PRNGKey(0),
        (_bucket(Tk, 32) + 32, 128, 128, 256),
        jnp.float32,
    )
    kpts = jnp.asarray(rng.uniform(16, 240, (P, 2)), jnp.float32)
    kvalid = jnp.ones((P,), bool)
    kargs = (kbank, jnp.int32(0), kpts, kvalid)
    kkw = dict(full_hw=(256, 256), length=_bucket(Tk, 32))
    kinetics = {}
    for name, c in (("kinetics_fps", kcfg), ("kinetics_exact_fps", kcfg_exact)):
        ktr = Tracker(lambda v, x: x, {}, c)
        float(jnp.sum(ktr._track_group(*kargs, **kkw)))  # warm + sync
        kr = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(ktr._track_group(*kargs, **kkw)))
            kr.append((Tk - 1) / (time.perf_counter() - t0))
        kinetics[name] = round(float(np.median(kr)), 2)

    # VOS regression point: full-res DAVIS-VOS shapes (480×880), save_mem
    # STREAMING propagation (backbone runs inside the scan; window-bounded
    # memory — the mode tools/test.py --task vos uses for long full-res
    # videos).  Video is device-resident uint8: the 60 MB upload through
    # the tunnel would swamp the measurement, and production hosts move it
    # at GB/s over PCIe.  Exact + headline precision, like Kinetics.
    del kbank, kargs
    gc.collect()
    Hv, Wv, Tv = 480, 880, 48
    vcfg_exact = dataclasses.replace(
        DAVIS_TEST_CFG, input_size=(Hv, Wv), save_mem=True, frame_bucket=48
    )
    vcfg = dataclasses.replace(vcfg_exact, matmul_precision="default")
    vvideo = jax.device_put(
        rng.integers(0, 256, (Tv, Hv, Wv, 3), dtype=np.uint8)
    )
    vmask = np.zeros((Hv, Wv), np.int32)
    vmask[100:300, 200:500] = 1
    vmask[320:420, 600:800] = 2
    vos = {}
    for name, c in (("vos_fps", vcfg), ("vos_exact_fps", vcfg_exact)):
        vtr = Tracker(
            lambda v, x: model.apply(v, x, train=False), variables, c
        )
        fh, fw = vtr.extract_features(vvideo[:1]).shape[1:3]
        small = jax.image.resize(
            jnp.asarray(vmask, jnp.float32)[..., None],
            (fh, fw, 1),
            method="nearest",
        )[..., 0].astype(jnp.int32)
        onehot = jax.nn.one_hot(small, 3, dtype=jnp.float32)
        call = lambda: float(
            jnp.sum(vtr._propagate_m_stream(vvideo, onehot, (Hv, Wv), "square"))
        )
        call()  # warm + sync
        vr = []
        for _ in range(5):  # 5 sweeps: tunnel weather swings 3-run medians
            t0 = time.perf_counter()
            call()
            vr.append((Tv - 1) / (time.perf_counter() - t0))
        vos[name] = round(float(np.median(vr)), 2)

    record = {
        "metric": "davis_propagation_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
        "headline_mode": "pallas-bf16 + yuv420 upload "
        "(study-promoted; docs/precision_study.md; library default "
        "stays f32-exact + rgb)",
        "propagation_only_fps": round(prop_fps, 2),
        "single_video_fps": round(sv_fps, 2),
        "exact_mode_fps": round(exact_fps, 2),
        "high_mode_fps": round(high_fps, 2),
        "tunnel_MBps": round(mb / up_s, 1),
        "upload_ms_per_frame": round(1e3 * up_s / T, 2),
        "end_to_end_runs": [round(r, 2) for r in runs],
        **kinetics,
        **vos,
    }
    print(json.dumps(record))
    # persist for the outage path: if a later invocation finds the tunnel
    # down, its error record embeds this last on-chip measurement
    try:
        record["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        with open(_LAST_GOOD_PATH, "w") as f:
            json.dump(record, f)
    except OSError:
        pass


if __name__ == "__main__":
    main()
