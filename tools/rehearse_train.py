#!/usr/bin/env python
"""Reference-scale training REHEARSAL on a virtual CPU mesh — the full
L5-L7 stack (launch.py → tools/train.py → train_model) end-to-end with a
mid-run preemption, not unit pieces:

  phase 1  launch.py spawns `--nprocs` coordinated jax.distributed
           processes, each holding `--devices-per-proc` virtual CPU
           devices (an nprocs×dpp-way global 'data' mesh); mixed training
           runs with mid-train val until a SIGTERM hits the LAUNCHER at
           `--preempt-step` (cluster managers signal the launcher; the
           forwarder added for this rehearsal relays it to every rank,
           whose train_model handlers agree on a stop step and
           checkpoint).
  phase 2  the same command restarts, resumes from the preemption
           checkpoint (optimizer moments + loader fast-forward + per-step
           fold_in RNG), and runs to `--steps` with val firing.
  twin     an UNINTERRUPTED run of the same recipe in a fresh work_dir.

Verified (and written to rehearsal_report.json):
  * phase 1 stopped at a step boundary >= preempt-step with a
    "preempted: saved" checkpoint from every-rank agreement;
  * phase 2 logged "resumed from ... (step K)" with K = the preemption
    step, and the JSONL step sequence across both phases is exactly
    1..steps with no gap or duplicate;
  * val metrics appear at every --val-interval multiple and at the end,
    and a best checkpoint pointer exists;
  * STEP-EXACTNESS: the preempted+resumed run's logged losses at every
    post-resume step match the uninterrupted twin's to float tolerance
    (same batches via loader skip, same keys via fold_in, state through
    an orbax round-trip).

The committed evidence log is docs/train_rehearsal.log (run with
--tee-log).  The reference has no preemption story to rehearse
(/root/reference/mmpt/apis/train.py:89-244 — no signal handling, no
elastic resume); this validates the TPU-pod story the rebuild adds.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train_cmd(args, work_dir):
    return [
        sys.executable,
        os.path.join(REPO, "tools", "launch.py"),
        "--nprocs",
        str(args.nprocs),
        "--",
        sys.executable,
        os.path.join(REPO, "tools", "train.py"),
        "--platform",
        "cpu",
        "--synthetic",
        "--batch-size",
        str(args.batch_size),
        "--crop",
        str(args.crop),
        "--radius",
        str(args.radius),
        "--max-steps",
        str(args.steps),
        "--steps-per-epoch",
        str(args.steps),
        "--log-interval",
        "1",
        "--ckpt-interval",
        str(args.ckpt_interval),
        "--val-interval",
        str(args.val_interval),
        "--synthetic-val",
        "--work-dir",
        work_dir,
    ]


def _run_phase(args, work_dir, log_f, preempt_step=None, timeout=1800):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc}"
    )
    p = subprocess.Popen(
        _train_cmd(args, work_dir),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        env=env,
        cwd=REPO,
        text=True,
    )
    jsonl = os.path.join(work_dir, "train_log.jsonl")
    sent = False
    lines = []
    import threading

    def pump():
        for line in p.stdout:
            lines.append(line)
            log_f.write(line)
            log_f.flush()

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    t0 = time.time()
    while p.poll() is None:
        if time.time() - t0 > timeout:
            p.kill()
            raise TimeoutError(f"phase exceeded {timeout}s")
        if preempt_step is not None and not sent and os.path.exists(jsonl):
            steps = []
            with open(jsonl) as f:
                for l in f:
                    if not l.strip():
                        continue
                    # the trainer appends concurrently; the last line may be
                    # mid-write (val records are multi-KB) — skip it rather
                    # than abort the monitor
                    try:
                        steps.append(json.loads(l).get("step", 0))
                    except json.JSONDecodeError:
                        continue
            if steps and max(steps) >= preempt_step:
                log_f.write(
                    f"[rehearsal] step {max(steps)} reached — SIGTERM to "
                    "the launcher\n"
                )
                log_f.flush()
                p.send_signal(signal.SIGTERM)
                sent = True
        time.sleep(0.5)
    t.join(timeout=10)
    return p.returncode, "".join(lines)


def _read_jsonl(work_dir):
    path = os.path.join(work_dir, "train_log.jsonl")
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--work-dir", default="runs/rehearsal")
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=8,
                    help="global batch (must divide the mesh size)")
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--radius", type=int, default=3)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--preempt-step", type=int, default=23)
    ap.add_argument("--ckpt-interval", type=int, default=10)
    ap.add_argument("--val-interval", type=int, default=20)
    ap.add_argument("--tee-log", default=None,
                    help="also write the full rehearsal transcript here")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    os.makedirs(args.work_dir, exist_ok=True)
    log_path = args.tee_log or os.path.join(args.work_dir, "rehearsal.log")
    report = {
        "mesh": f"{args.nprocs} procs x {args.devices_per_proc} devices "
        f"= {args.nprocs * args.devices_per_proc}-way data mesh",
        "global_batch": args.batch_size,
        "steps": args.steps,
    }
    main_dir = os.path.join(args.work_dir, "preempted")
    twin_dir = os.path.join(args.work_dir, "uninterrupted")
    for d in (main_dir, twin_dir):
        os.makedirs(d, exist_ok=True)

    with open(log_path, "w") as log_f:
        hdr = (
            f"=== rehearsal: {report['mesh']}, global B={args.batch_size}, "
            f"{args.steps} steps, SIGTERM @ ~step {args.preempt_step}, "
            f"val every {args.val_interval} ===\n"
        )
        log_f.write(hdr)
        print(hdr, end="")

        log_f.write("\n--- phase 1: train until preemption ---\n")
        rc1, out1 = _run_phase(
            args, main_dir, log_f, preempt_step=args.preempt_step,
            timeout=args.timeout,
        )
        assert rc1 == 0, f"phase 1 exit code {rc1}"
        # regex over the raw stream: rank stdouts interleave mid-line
        stops = re.findall(r"preempted: stopping at step (\d+)", out1)
        assert stops, "no agreed stop step logged"
        stop_steps = {int(s) for s in stops}
        assert len(stop_steps) == 1, (
            f"ranks stopped at different steps: {stop_steps}"
        )
        k = stop_steps.pop()
        assert args.preempt_step <= k < args.steps, (k, args.preempt_step)
        # the stop step's checkpoint exists — saved by the preemption branch
        # or, when the boundary coincides, the regular ckpt-interval branch
        assert f"step_{k}" in out1 and "saved" in out1, (
            f"no checkpoint at the stop step {k}"
        )
        # every rank must have agreed (the _sync_stop allgather)
        assert len(stops) == args.nprocs, stops
        report["preempt_stop_step"] = k
        print(f"phase 1 ok: all {args.nprocs} ranks stopped at step {k}")

        log_f.write("\n--- phase 2: resume to completion ---\n")
        rc2, out2 = _run_phase(args, main_dir, log_f, timeout=args.timeout)
        assert rc2 == 0, f"phase 2 exit code {rc2}"
        resumed = re.findall(r"resumed from \S+ \(step (\d+)\)", out2)
        assert len(resumed) == args.nprocs, (resumed, out2[-500:])
        assert all(int(s) == k for s in resumed), (resumed, k)
        report["resume_step"] = k
        print(f"phase 2 ok: all ranks resumed from step {k}")

        log_f.write("\n--- twin: uninterrupted run ---\n")
        rc3, _ = _run_phase(args, twin_dir, log_f, timeout=args.timeout)
        assert rc3 == 0, f"twin exit code {rc3}"

        # ---- verification over the logs ---------------------------------- #
        logs = _read_jsonl(main_dir)
        loss_steps = [r["step"] for r in logs if "loss" in r]
        assert loss_steps == list(range(1, args.steps + 1)), (
            "step sequence across preempt+resume is not exactly "
            f"1..{args.steps}: {loss_steps}"
        )
        val_steps = [r["step"] for r in logs if "val" in r]
        expect_vals = sorted(
            set(range(args.val_interval, k + 1, args.val_interval))
            | set(range(args.val_interval, args.steps + 1, args.val_interval))
            | {args.steps}
        )
        assert val_steps == expect_vals, (val_steps, expect_vals)
        assert os.path.exists(os.path.join(main_dir, "best")), "no best ptr"
        report["val_steps"] = val_steps
        report["val_metrics"] = [r["val"] for r in logs if "val" in r]

        twin = {
            r["step"]: r for r in _read_jsonl(twin_dir) if "loss" in r
        }
        main_by_step = {s: r for s, r in zip(loss_steps, (
            r for r in logs if "loss" in r))}
        max_dev = 0.0
        for s in range(k + 1, args.steps + 1):
            for key in ("loss", "l1_loss", "sup_loss"):
                if key in twin[s] and key in main_by_step[s]:
                    d = abs(twin[s][key] - main_by_step[s][key]) / max(
                        abs(twin[s][key]), 1e-9
                    )
                    max_dev = max(max_dev, d)
        report["post_resume_max_rel_loss_dev_vs_uninterrupted"] = max_dev
        assert max_dev < 1e-4, (
            "resumed run diverged from the uninterrupted twin: "
            f"max rel dev {max_dev}"
        )
        tail = (
            f"\n=== rehearsal PASSED ===\n"
            f"stop/resume step: {k}; steps 1..{args.steps} contiguous; "
            f"val @ {val_steps}; post-resume losses match the "
            f"uninterrupted twin to {max_dev:.2e} (step-exact resume)\n"
        )
        log_f.write(tail)
        print(tail, end="")

    with open(os.path.join(args.work_dir, "rehearsal_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"report: {os.path.join(args.work_dir, 'rehearsal_report.json')}")
    print(f"transcript: {log_path}")


if __name__ == "__main__":
    main()
