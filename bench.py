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
figure; `*propagation*_fps` keys isolate the scan (tunnel-independent —
the parity >5× claim is stated against these; the e2e keys are the
deployment numbers and ride host/tunnel weather).

Fault tolerance: each section (davis headline / exact / high / propagation /
kinetics / vos) runs fault-isolated — a mid-run TPU worker crash or tunnel
drop is caught, the backend is re-probed via wait_for_backend, the section
retried once, and on permanent failure the one-line JSON is STILL emitted
with every section that did measure plus an `errors` key and the embedded
last-good record.  Round 4's official record was lost to exactly one such
transient fault (BENCH_r04.json rc=1); this must never happen again.

Baseline: the reference publishes no throughput (README only notes 4×A100-80G
and the `step` memory/speed dial).  We estimate the reference GPU hot loop at
~20 propagated frames/sec/A100: 6 key frames × (16384×16384×256) f32 einsum
≈ 412 GFLOP/frame plus top-k over 98k keys, at a realistic 8-10 TFLOP/s
effective f32 → ≈50 ms/frame.  vs_baseline = our fps / 20.
"""

from __future__ import annotations

import json
import os
import sys
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


def wait_for_backend(max_wait_s: float = 1800.0, exit_on_fail: bool = True) -> bool:
    """The v5e chip sits behind a shared tunnel that occasionally drops
    (backend init then raises UNAVAILABLE or hangs).  Probe it in a
    SUBPROCESS — a failed init can poison the parent's backend cache —
    and wait for recovery up to FGVC_BENCH_BACKEND_WAIT seconds.

    exit_on_fail=True (startup): on timeout emit an honest error record
    (value 0) and exit 1 instead of hanging the bench harness.
    exit_on_fail=False (mid-run re-probe from run_section): return False
    on timeout so the caller can record the section error and CONTINUE —
    a partial record beats a crashed run.
    """
    import subprocess

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
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > max_wait_s:
            if not exit_on_fail:
                return False
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


def run_section(name, fn, errors, reprobe_wait_s: float = 900.0):
    """Run one bench section fault-isolated.

    On ANY exception (TPU worker crash surfaces as XlaRuntimeError /
    jax.errors.JaxRuntimeError; HBM OOM as RuntimeError): re-probe the
    backend via wait_for_backend, retry the section ONCE, and on permanent
    failure record the error under `name` and return None so the remaining
    sections (and the final JSON emission) still run.
    """
    try:
        return fn()
    except KeyboardInterrupt:
        raise
    except Exception as e:  # noqa: BLE001 — partial record beats a crash
        if any(
            m in str(e) for m in ("Ran out of memory", "RESOURCE_EXHAUSTED")
        ):
            # deterministic HBM OOM (e.g. a bank beyond the single-chip
            # ceiling — docs/roofline.md "bank capacity"): a backend
            # re-probe + retry cannot change the outcome; degrade
            # immediately and keep the remaining sections
            errors[name] = f"{type(e).__name__} (hbm oom): {str(e)[:300]}"
            print(
                f"# section {name!r} hit HBM OOM — recording and "
                "continuing",
                file=sys.stderr,
            )
            return None
        print(
            f"# section {name!r} failed ({type(e).__name__}): "
            f"{str(e)[:200]} — re-probing backend",
            file=sys.stderr,
        )
        if not wait_for_backend(reprobe_wait_s, exit_on_fail=False):
            errors[name] = (
                f"{type(e).__name__}: {str(e)[:300]}; backend did not "
                f"recover within {reprobe_wait_s:.0f}s"
            )
            return None
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except Exception as e2:  # noqa: BLE001
            errors[name] = f"{type(e2).__name__}: {str(e2)[:300]} (after retry)"
            print(
                f"# section {name!r} failed again after backend re-probe — "
                "recording error and continuing",
                file=sys.stderr,
            )
            return None


def emit_record(record, errors, measured_sections) -> int:
    """Print the one-line JSON (always) and persist last-good (clean runs
    only, so the embedded fallback stays a COMPLETE record).  Returns the
    process exit code: 0 if anything measured, 1 if nothing did."""
    if errors:
        record["errors"] = dict(errors)
        try:
            with open(_LAST_GOOD_PATH) as f:
                record["last_good_on_chip"] = json.load(f)
        except (OSError, ValueError):
            pass
    print(json.dumps(record))
    if not errors and measured_sections:
        try:
            saved = dict(record)
            saved["measured_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
            )
            with open(_LAST_GOOD_PATH, "w") as f:
                json.dump(saved, f)
        except OSError:
            pass
    return 0 if measured_sections else 1


def main():
    wait_for_backend()
    import dataclasses
    import gc

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

    apply = lambda v, x: model.apply(v, x, train=False)
    tracker = Tracker(apply, variables, cfg)
    tracker_exact = Tracker(apply, variables, cfg_exact)
    # 'high' mode: explicit bf16x3 affinity/value matmuls (Δ<D −0.009 in
    # the study — an order tighter than the bf16 headline) — the fast
    # parity-grade option if real data ever rejects the bf16 promotion
    tracker_high = Tracker(
        apply, variables, dataclasses.replace(cfg_exact, matmul_precision="high")
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

    # END-TO-END = the eval harness's pipelined video loop (apis/test.py
    # eval_tapvid), SCAN-FIRST dispatch order: video i's propagation is
    # enqueued BEFORE video i+1's upload + features, so the transfer
    # streams behind the scan on the in-order device queue (measured +18
    # fps in the f32 mode — tools/bench/upload_overlap.py).  This is the
    # throughput `tools/test.py` delivers on a dataset.  Measured over 4
    # videos, median of 5 sweeps (tunnel congestion swings 3-sweep medians
    # ±5 fps).
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

    def pipelined_median(tr):
        pipelined_sweep(tr)  # warm the prefetch path
        runs = [pipelined_sweep(tr)[1] for _ in range(5)]
        return float(np.median(runs)), runs

    errors = {}
    measured = []
    record = {
        "metric": "davis_propagation_frames_per_sec_per_chip",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "headline_mode": "pallas-bf16 + yuv420 upload "
        "(study-promoted; docs/precision_study.md; library default "
        "stays f32-exact + rgb)",
    }

    def sec(name, fn):
        out = run_section(name, fn, errors)
        if out is not None:
            record.update(out)
            measured.append(name)

    def davis_headline():
        # warmup (compile)
        out = tracker.track_points(videos[0], query_points)
        jax.block_until_ready(jnp.zeros(()))
        fps, runs = pipelined_median(tracker)
        # single-video latency figure (no cross-video pipelining)
        sv_runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = tracker.track_points(videos[0], query_points)
            sv_runs.append((T - 1) / (time.perf_counter() - t0))
        assert np.all(
            np.isfinite(out["trajectories"])
        ), "non-finite trajectories"
        return {
            "value": round(fps, 2),
            "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
            "single_video_fps": round(float(np.median(sv_runs)), 2),
            "end_to_end_runs": [round(r, 2) for r in runs],
        }

    def tunnel_probe():
        # tunnel-bandwidth probe: the e2e-vs-propagation gap is host→device
        # upload through the shared tunnel (196 KB/frame of uint8);
        # production TPU hosts move this over local PCIe/DMA at GB/s.
        up = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jnp.asarray(videos[0])
            float(jnp.sum(d.astype(jnp.float32)))
            up.append(time.perf_counter() - t0)
        up_s = float(np.median(up))
        mb = videos[0].nbytes / 1e6
        return {
            "tunnel_MBps": round(mb / up_s, 1),
            "upload_ms_per_frame": round(1e3 * up_s / T, 2),
        }

    def davis_exact():
        return {"exact_mode_fps": round(pipelined_median(tracker_exact)[0], 2)}

    def davis_high():
        return {"high_mode_fps": round(pipelined_median(tracker_high)[0], 2)}

    def propagation():
        # propagation-only: features precomputed, single query group, no
        # host transfers in the loop — isolates the attention+decode scan.
        # Measured for ALL THREE precision modes: these are the
        # tunnel-independent figures the >5× parity claim is stated
        # against (the e2e keys above mix in host/tunnel weather).
        feats = tracker._features_padded(videos[0])
        pts = jnp.asarray(query_points[:, 1:])
        valid = jnp.ones((query_points.shape[0],), bool)
        args = (feats, jnp.int32(0), pts, valid)
        kw = dict(full_hw=cfg.input_size, length=T)
        out = {}
        for key, tr in (
            ("propagation_only_fps", tracker),
            ("exact_propagation_fps", tracker_exact),
            ("high_propagation_fps", tracker_high),
        ):
            float(jnp.sum(tr._track_group(*args, **kw)))  # warm + sync
            pr = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(jnp.sum(tr._track_group(*args, **kw)))
                pr.append((T - 1) / (time.perf_counter() - t0))
            out[key] = round(float(np.median(pr)), 2)
        del feats, args
        return out

    def kinetics():
        # Kinetics-scale regression point: 250-frame video → ~5 GB f32 HBM
        # feature bank, bank-direct Pallas propagation (the large-bank path
        # tools/bench/kinetics_propagation.py studies).  The bank is built
        # on-device (a 4.8 GB upload through the tunnel would swamp the
        # measurement; the kernel work is identical on random features).
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
        out = {}
        for name, c in (
            ("kinetics_fps", kcfg),
            ("kinetics_exact_fps", kcfg_exact),
        ):
            ktr = Tracker(lambda v, x: x, {}, c)
            float(jnp.sum(ktr._track_group(*kargs, **kkw)))  # warm + sync
            kr = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jnp.sum(ktr._track_group(*kargs, **kkw)))
                kr.append((Tk - 1) / (time.perf_counter() - t0))
            out[name] = round(float(np.median(kr)), 2)
        del kbank, kargs
        return out

    def vos():
        # VOS regression point: full-res DAVIS-VOS shapes (480×880),
        # save_mem STREAMING propagation (backbone runs inside the scan;
        # window-bounded memory — the mode tools/test.py --task vos uses
        # for long full-res videos).  Video is device-resident uint8: the
        # 60 MB upload through the tunnel would swamp the measurement, and
        # production hosts move it at GB/s over PCIe.  This is the section
        # whose transient worker crash killed BENCH_r04 — now isolated.
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
        out = {}
        for name, c in (("vos_fps", vcfg), ("vos_exact_fps", vcfg_exact)):
            vtr = Tracker(apply, variables, c)
            fh, fw = vtr.extract_features(vvideo[:1]).shape[1:3]
            small = jax.image.resize(
                jnp.asarray(vmask, jnp.float32)[..., None],
                (fh, fw, 1),
                method="nearest",
            )[..., 0].astype(jnp.int32)
            onehot = jax.nn.one_hot(small, 3, dtype=jnp.float32)
            call = lambda: float(
                jnp.sum(
                    vtr._propagate_m_stream(vvideo, onehot, (Hv, Wv), "square")
                )
            )
            call()  # warm + sync
            vr = []
            for _ in range(5):
                t0 = time.perf_counter()
                call()
                vr.append((Tv - 1) / (time.perf_counter() - t0))
            out[name] = round(float(np.median(vr)), 2)
        return out

    sec("davis_headline", davis_headline)
    sec("tunnel_probe", tunnel_probe)
    sec("davis_exact", davis_exact)
    sec("davis_high", davis_high)
    sec("propagation", propagation)
    del tracker_high
    # Free the DAVIS-phase device arrays before the big-bank sections:
    # bank (4.8 GB) + the in-jit query-group slice (4.3 GB) barely fit
    # 16 GB HBM next to the resident executables.
    gc.collect()
    sec("kinetics", kinetics)
    gc.collect()
    sec("vos", vos)

    sys.exit(emit_record(record, errors, measured))


if __name__ == "__main__":
    main()
