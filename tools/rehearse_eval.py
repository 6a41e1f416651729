#!/usr/bin/env python
"""On-chip dress rehearsal of the real-data evaluation day (round-5 task 3).

Every real-data path is CPU-tested (tests/test_reproduce_cli.py, harness
tests), but the exact commands that will run when TAP-Vid/DAVIS datasets
mount had never executed ON TPU end-to-end through the real CLIs.  This
tool stages that day with synthetic data and runs it for real:

  1. MOVi TAP-Vid-format pickles (tools/data/generate_movi.py scenes);
  2. a DAVIS-2017-layout VOS dataset (JPEGImages/Annotations/ImageSets)
     from MOVi scenes with exact instance-segmentation ground truth;
  3. a mock released checkpoint: randomized ResNet-18-d1 weights exported
     to the reference's mmcv `.pth` naming (models/torch_convert.py
     export_resnet_state_dict) — so checkpoint conversion AND the
     flax-vs-torch feature parity probe run exactly as on day one;
  4. `tools/test.py --task davis`  (pickle reader -> pipeline -> pipelined
     dispatch -> TAP metrics);
  5. `tools/test.py --task vos --save-mem`  (DAVIS reader -> streaming
     save_mem propagation -> J&F);
  6. `tools/reproduce.py --davis-root ... --fast-modes`  (parity probe +
     published-number comparison + fast-mode delta sweep).

Each step is a subprocess (the production command line, recorded
verbatim) with wall-clock timing; results are written to
docs/rehearsal_eval.md + a JSON report.

Run from the repo root (TPU): python tools/rehearse_eval.py
"""

import argparse
import json
import os
import pickle
import shlex
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools", "data"))


def build_tapvid(out_dir, scenes, frames, size, seed):
    import numpy as np
    from generate_movi import generate_scene

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_frames = 0
    for i in range(scenes):
        rec = generate_scene(rng, num_frames=frames, size=size)
        with open(os.path.join(out_dir, f"movi_{i:05d}.pkl"), "wb") as f:
            pickle.dump(rec, f)
        n_frames += rec["video"].shape[0]
    return n_frames


def build_vos(out_dir, scenes, frames, size, seed):
    """DAVIS-2017 val layout from MOVi scenes with GT segmentation."""
    import cv2
    import numpy as np
    from PIL import Image

    from generate_movi import generate_scene

    rng = np.random.default_rng(seed)
    seqs = []
    n_frames = 0
    for i in range(scenes):
        rec = generate_scene(
            rng, num_frames=frames, size=size, return_segmentation=True
        )
        seq = f"movi_{i:02d}"
        seqs.append(seq)
        jdir = os.path.join(out_dir, "JPEGImages", "480p", seq)
        adir = os.path.join(out_dir, "Annotations", "480p", seq)
        os.makedirs(jdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        for t in range(rec["video"].shape[0]):
            cv2.imwrite(
                os.path.join(jdir, f"{t:05d}.jpg"),
                cv2.cvtColor(rec["video"][t], cv2.COLOR_RGB2BGR),
            )
            Image.fromarray(rec["segmentation"][t], mode="L").save(
                os.path.join(adir, f"{t:05d}.png")
            )
        n_frames += rec["video"].shape[0]
    lst = os.path.join(out_dir, "ImageSets", "2017")
    os.makedirs(lst, exist_ok=True)
    with open(os.path.join(lst, "val.txt"), "w") as f:
        f.write("\n".join(seqs) + "\n")
    return n_frames


def build_mock_pth(path, seed=0):
    """Randomized res18-d1 weights in the released checkpoint's naming."""
    import jax
    import numpy as np
    import torch

    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
    from fgvc_tpu.models.torch_convert import export_resnet_state_dict

    variables = init_resnet_params(
        resnet18_d1(), jax.random.PRNGKey(seed), (64, 64)
    )
    # randomize the BN affine + running stats too: flax init leaves them at
    # (1, 0, 0, 1), which would let a converter that drops/permutes BN
    # leaves pass the parity probe unnoticed
    rng = np.random.default_rng(seed)

    def perturb(path_ks, leaf):
        name = path_ks[-1].key if hasattr(path_ks[-1], "key") else ""
        a = np.asarray(leaf)
        if name == "scale":
            return a * rng.uniform(0.5, 1.5, a.shape).astype(a.dtype)
        if name == "bias":
            return a + rng.normal(0, 0.1, a.shape).astype(a.dtype)
        if name == "mean":
            return a + rng.normal(0, 0.2, a.shape).astype(a.dtype)
        if name == "var":
            return a * rng.uniform(0.5, 1.5, a.shape).astype(a.dtype)
        return a

    variables = jax.tree_util.tree_map_with_path(perturb, variables)
    state = export_resnet_state_dict(variables, prefix="backbone.")
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v).copy())
                        for k, v in state.items()}},
        path,
    )


def run_step(name, cmd, results, timeout=5400, ok_rcs=(0,)):
    """Run one production command; `ok_rcs` lists the return codes that
    count as a successful rehearsal (tools/reproduce.py exits 1 BY DESIGN
    when a task misses the ±0.5 reproduction bar — inevitable, and
    correct, with the rehearsal's mock random-weight checkpoint)."""
    prev = results.get(name) or {}
    print(f"\n### {name}: {shlex.join(cmd)}", flush=True)
    t0 = time.perf_counter()
    r = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=timeout
    )
    dt = time.perf_counter() - t0
    out_json = None
    # the CLIs end with a JSON blob (indent=2) — parse from the last '{'
    tail = r.stdout.strip()
    if tail.endswith("}"):
        depth = 0
        for i in range(len(tail) - 1, -1, -1):
            depth += {"}": 1, "{": -1}.get(tail[i], 0)
            if depth == 0:
                try:
                    out_json = json.loads(tail[i:])
                except ValueError:
                    pass
                break
    ok = r.returncode in ok_rcs
    results[name] = {
        "cmd": shlex.join(cmd),
        "wall_s": round(dt, 1),
        # tunnel weather swings step walls several-fold between otherwise
        # identical runs; keep every observed wall so the report shows the
        # spread instead of whichever run happened last
        "wall_s_history": (prev.get("wall_s_history") or [])
        + [round(dt, 1)],
        "returncode": r.returncode,
        "rc_ok": ok,
        "metrics": out_json,
    }
    if not ok:
        results[name]["stderr_tail"] = r.stderr[-2000:]
        print(r.stderr[-2000:], file=sys.stderr)
    print(f"### {name}: rc={r.returncode} wall={dt:.1f}s", flush=True)
    return ok


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default=os.path.join(REPO, "data", "rehearsal_eval"))
    p.add_argument("--scenes", type=int, default=6)
    p.add_argument("--frames", type=int, default=48)
    p.add_argument("--vos-scenes", type=int, default=3)
    p.add_argument("--vos-frames", type=int, default=32)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--report", default=os.path.join(REPO, "docs", "rehearsal_eval.md"))
    p.add_argument("--json", default=os.path.join(REPO, "docs", "rehearsal_eval_report.json"))
    p.add_argument("--skip-generate", action="store_true")
    p.add_argument("--note", action="append", default=[],
                   help="finding to record in the report's findings "
                        "section (persisted in the JSON across reruns)")
    p.add_argument("--steps", default="davis,kinetics,vos,reproduce",
                   help="comma list of steps to (re)run; earlier steps' "
                        "results are kept from the existing JSON report")
    args = p.parse_args()

    tap_dir = os.path.join(args.root, "tapvid")
    vos_dir = os.path.join(args.root, "vos")
    ckpt = os.path.join(args.root, "mock_res18_d1_mixed_training.pth")
    steps = set(args.steps.split(","))
    results = {}
    if os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f)
    if args.note:
        notes = results.setdefault("_notes", {"notes": []})
        notes["notes"].extend(args.note)

    if not args.skip_generate or not os.path.exists(ckpt):
        t0 = time.perf_counter()
        tap_frames = build_tapvid(
            tap_dir, args.scenes, args.frames, args.size, args.seed
        )
        vos_frames = build_vos(
            vos_dir, args.vos_scenes, args.vos_frames, args.size, args.seed + 1
        )
        build_mock_pth(ckpt, args.seed)
        results["generate"] = {
            "wall_s": round(time.perf_counter() - t0, 1),
            "tapvid_frames": tap_frames,
            "vos_frames": vos_frames,
        }

    py = sys.executable
    if "davis" in steps:
        run_step(
            "davis",
            [py, "tools/test.py", "--task", "davis", "--data-root", tap_dir,
             "--checkpoint", ckpt,
             "--output-dir", os.path.join(args.root, "out_davis")],
            results,
        )
    if "kinetics" in steps:
        # same per-video pickle format as davis (generate_tapvid_kinetics
        # writes the identical {'video','points','occluded'} records), so
        # the TAP-Vid shard doubles as a Kinetics root — this exercises
        # KINETICS_TEST_CFG (query-first protocol, kinetics bank sizing)
        # through the CLI on chip
        run_step(
            "kinetics",
            [py, "tools/test.py", "--task", "kinetics", "--data-root",
             tap_dir, "--checkpoint", ckpt,
             "--output-dir", os.path.join(args.root, "out_kinetics")],
            results,
        )
    if "vos" in steps:
        run_step(
            "vos",
            [py, "tools/test.py", "--task", "vos", "--data-root", vos_dir,
             "--checkpoint", ckpt, "--save-mem",
             "--input-size", str(args.size),
             "--output-dir", os.path.join(args.root, "out_vos")],
            results,
        )
    if "reproduce" in steps:
        # rc=1 == "every step ran; the ±0.5 reproduction bar was missed" —
        # the CORRECT outcome for random mock weights on synthetic scenes
        # (the rehearsal proves the machinery, not the numbers).  rc=2
        # (parity-probe abort) and any crash remain failures.
        run_step(
            "reproduce",
            [py, "tools/reproduce.py", "--checkpoint", ckpt,
             "--davis-root", tap_dir, "--fast-modes",
             "--output-dir", os.path.join(args.root, "out_reproduce")],
            results,
            ok_rcs=(0, 1),
        )
        rep_json = os.path.join(args.root, "out_reproduce", "report.json")
        if os.path.exists(rep_json):
            with open(rep_json) as f:
                rep = json.load(f)
            results["reproduce"]["metrics"] = {
                "feature_parity": rep.get("feature_parity"),
                "davis_vs_published": {
                    k: v for k, v in rep.get("tasks", {})
                    .get("davis", {}).items() if k != "all_metrics"
                },
                "fast_modes": rep.get("fast_modes"),
            }

    # frames/s per eval step (video frames scored / CLI wall time —
    # includes compile on a cold cache; see per-step notes)
    for name, frames in (
        ("davis", args.scenes * args.frames),
        ("kinetics", args.scenes * args.frames),
        ("vos", args.vos_scenes * args.vos_frames),
    ):
        if name in results and results[name]["returncode"] == 0:
            results[name]["cli_fps"] = round(
                frames / results[name]["wall_s"], 2
            )

    with open(args.json, "w") as f:
        json.dump(results, f, indent=2)
    write_report(args, results)
    print(f"\nwrote {args.report} + {args.json}")
    sys.exit(0 if all(
        r.get("rc_ok", r.get("returncode", 0) == 0)
        for r in results.values()
    ) else 1)


def write_report(args, results):
    import jax

    dev = jax.devices()[0]
    lines = [
        "# On-chip evaluation dress rehearsal (round 5)",
        "",
        "The real-data day, staged: the exact `tools/test.py` and",
        "`tools/reproduce.py` commands that will run when TAP-Vid/DAVIS",
        "datasets mount, executed end-to-end on the real chip over",
        "synthetic MOVi data in the real formats (TAP-Vid pickles; a",
        "DAVIS-2017 directory tree with palette-PNG annotations) and a",
        "mock released checkpoint in the reference's mmcv `.pth` naming —",
        "so checkpoint conversion, the torch-twin feature-parity probe,",
        "the dataset readers, the pipelined dispatch/collect eval loop,",
        "the metrics, and the report writers all run as on day one.",
        "Generated by tools/rehearse_eval.py; metrics are synthetic-data",
        "values (random-ish weights), NOT benchmark claims.",
        "",
        f"- device: `{dev.device_kind}` ({dev.platform})",
        f"- data: {args.scenes}x{args.frames}f TAP-Vid pickles + "
        f"{args.vos_scenes}x{args.vos_frames}f DAVIS-VOS tree, {args.size}px",
        "",
    ]
    def _round(o):
        if isinstance(o, float):
            # 4 significant digits, not 4 decimals: probe deltas are ~1e-5
            # and must not render as 0.0
            return float(f"{o:.4g}")
        if isinstance(o, dict):
            return {k: _round(v) for k, v in o.items()}
        if isinstance(o, list):
            return [_round(v) for v in o]
        return o

    for note in results.get("_notes", {}).get("notes", []):
        lines.append(f"- **finding:** {note}")
    if results.get("_notes"):
        lines.append("")

    for name, r in results.items():
        if name == "_notes":
            continue
        lines.append(f"## {name}")
        lines.append("")
        if "cmd" in r:
            lines.append(f"```\n{r['cmd']}\n```")
        rc = r.get("returncode", 0)
        rc_note = ""
        if name == "reproduce" and rc == 1:
            rc_note = (" (rc=1 is tools/reproduce.py's designed exit for "
                       "'ran fully, ±0.5 reproduction bar missed' — the "
                       "correct outcome for mock random weights)")
        lines.append(
            f"- wall: {r['wall_s']}s, rc={rc}{rc_note}"
            + (f", CLI throughput {r['cli_fps']} fps (incl. compile + "
               "host decode on the 1-core host)" if "cli_fps" in r else "")
        )
        hist = r.get("wall_s_history") or []
        if len(hist) > 1:
            lines.append(
                f"- wall across reruns: {hist} s — the spread is tunnel "
                "weather (host<->chip link), not code; see CLAUDE.md"
            )
        m = r.get("metrics")
        if m:
            flat = {
                k: _round(v) for k, v in m.items()
                if not isinstance(v, (dict, list))
            }
            if flat:
                lines.append(f"- metrics: `{json.dumps(flat)}`")
            for k, v in m.items():
                if isinstance(v, (dict, list)):
                    lines.append(f"- {k}: `{json.dumps(_round(v))}`")
        if "stderr_tail" in r:
            lines.append(f"- stderr tail:\n```\n{r['stderr_tail'][-600:]}\n```")
        lines.append("")
    with open(args.report, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
