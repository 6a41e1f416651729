#!/usr/bin/env python
"""Evaluation CLI — the tools/test.py of the framework.

Mirrors the reference interface (/root/reference/tools/test.py):

    python tools/test.py --task davis --data-root <dir> [--checkpoint ckpt.pth]

Tasks: davis / kinetics (TAP-Vid point tracking), jhmdb / badja (keypoint
PCK), vos (DAVIS J&F mask propagation).  Torch .pth checkpoints from the
reference release are converted on the fly.
"""

import argparse
import json



def main():
    parser = argparse.ArgumentParser(description="fgvc_tpu evaluation")
    parser.add_argument(
        "--task",
        required=True,
        choices=["davis", "kinetics", "jhmdb", "badja", "vos"],
    )
    parser.add_argument("--data-root", required=True)
    parser.add_argument("--list-path", default=None)
    parser.add_argument(
        "--annotations",
        default=None,
        metavar="CSV",
        help="TAP-Vid-Kinetics annotation CSV: evaluate --data-root's "
             "video clips directly (datasets/tapvid_kinetics.py), "
             "skipping the pickle-generation step",
    )
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument(
        "--model",
        default="vanilla",
        choices=["vanilla", "raft"],
        help="vanilla = label-propagation tracker; raft = flow-chaining baseline",
    )
    parser.add_argument(
        "--backbone",
        default="resnet18_d1",
        help="eval encoder from the zoo (models/zoo.py): resnet18_d1 "
             "(paper default), hrnet_w18, dino_vit_s8/s16/b8, vit_small_d8, "
             "swin_tiny, resnet18_mast, resnet18_pos — the reference swaps "
             "the config's backbone dict the same way (ablations)",
    )
    parser.add_argument("--max-videos", type=int, default=None)
    parser.add_argument("--output-dir", default="eval_results")
    parser.add_argument(
        "--config",
        default=None,
        help="JSON config file overlaid on the task preset (same knob "
             "names as the reference's test_cfg; the Config.fromfile "
             "equivalent). Explicit flags win over the file",
    )
    parser.add_argument(
        "--precision",
        default=None,
        choices=["highest", "high", "default"],
        help="affinity matmul precision (task preset: highest; "
             "default = bf16 multiplies)",
    )
    parser.add_argument(
        "--save-mem",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="stream features inside the scan (full-res VOS, long videos)",
    )
    parser.add_argument(
        "--attention-impl",
        default=None,
        choices=["pallas", "tiled", "dense", "c2f", "flow_guided"],
    )
    parser.add_argument(
        "--topk-impl",
        default=None,
        choices=["exact", "segmented", "certified", "approx"],
        help="XLA-path top-k implementation (pallas path is always exact)",
    )
    parser.add_argument(
        "--decode-impl",
        default=None,
        choices=["upsample", "window", "coarse"],
        help="coordinate decode: full-res upsample (reference-exact), "
             "windowed upsample around the peak, or feature-res soft-argmax",
    )
    parser.add_argument(
        "--upload-format",
        default=None,
        choices=["rgb", "yuv420"],
        help="host->device wire format: raw uint8 RGB (3 B/px) or I420 "
             "chroma-subsampled planes (1.5 B/px; sources are JPEG = "
             "already 4:2:0 — delta measured in docs/precision_study.md)",
    )
    parser.add_argument(
        "--query-mode",
        default="first",
        choices=["first", "strided"],
        help="TAP-Vid query sampling (strided = a query every 5 frames; "
             "pre-query frames stay zero, as in forward-only propagation)",
    )
    parser.add_argument(
        "--hard-prop",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="VOS: argmax->one-hot re-encode the value bank each step",
    )
    parser.add_argument(
        "--visibility-mode",
        default=None,
        choices=["none", "heatmap"],
        help="point-tracking visibility prediction: none = constant zeros "
             "(reference parity; AJ/OA degenerate), heatmap = peak-ratio "
             "estimate (calibrated in docs/visibility_study.md)",
    )
    parser.add_argument(
        "--visibility-threshold",
        type=float,
        default=None,
        help="peak_t / peak_query ratio above which a point counts visible",
    )
    parser.add_argument(
        "--coordinator",
        default=None,
        help="multi-host: jax.distributed coordinator address "
             "(videos shard rank::world; results allgather before scoring)",
    )
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument(
        "--profile",
        default=None,
        metavar="LOGDIR",
        help="write a jax.profiler device+host trace (TensorBoard/xprof)",
    )
    parser.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu"],
        help="force a jax platform (the JAX_PLATFORMS env var is overridden "
             "by device plugins in some environments; the config API wins)",
    )
    parser.add_argument(
        "--input-size",
        type=int,
        default=None,
        help="override the task's eval resolution (task defaults are the "
             "reference's: 256 for point tracking, full-res for VOS). "
             "Videos are resized and metrics rescaled accordingly — "
             "non-default sizes change the benchmark protocol; meant for "
             "CPU smokes and calibration studies",
    )
    parser.add_argument(
        "--local-devices",
        type=int,
        default=None,
        help="single-process data-parallel eval over N local devices "
             "(videos round-robin; all five tasks)",
    )
    parser.add_argument(
        "--spatial-devices",
        type=int,
        default=None,
        help="spatial-parallel propagation: shard each frame's query rows "
             "over N local devices (shard_map 'space' mesh; single-video "
             "latency scaling). Combine with --local-devices G for G video "
             "groups × N-way row sharding (needs G*N local devices)",
    )
    parser.add_argument(
        "--bank-devices",
        type=int,
        default=None,
        help="bank-parallel propagation: shard the feature bank's FRAMES "
             "over N local devices (shard_map 'bank' mesh; HBM capacity "
             "scaling for long videos — distributed exact top-k). "
             "attention_impl 'tiled' only; exclusive with --spatial-devices "
             "and --local-devices",
    )
    args = parser.parse_args()

    import dataclasses

    import jax

    if args.platform:
        from fgvc_tpu.utils.env import force_platform

        force_platform(args.platform)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from fgvc_tpu.parallel.dist import initialize_from_flags

    initialize_from_flags(
        args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    from fgvc_tpu.apis.test import TASK_CONFIGS, run_task

    base = TASK_CONFIGS[args.task]
    if args.config:
        from fgvc_tpu.config import config_from_file

        base = config_from_file(args.config, base)
    overrides = {}
    if args.precision:
        overrides["matmul_precision"] = args.precision
    if args.save_mem is not None:
        overrides["save_mem"] = args.save_mem
    if args.hard_prop is not None:
        overrides["hard_prop"] = args.hard_prop
    if args.attention_impl:
        overrides["attention_impl"] = args.attention_impl
    if args.topk_impl:
        overrides["topk_impl"] = args.topk_impl
    if args.decode_impl:
        overrides["decode_impl"] = args.decode_impl
    if args.upload_format:
        overrides["upload_format"] = args.upload_format
    if args.visibility_mode:
        overrides["visibility_mode"] = args.visibility_mode
    if args.visibility_threshold is not None:
        overrides["visibility_threshold"] = args.visibility_threshold
    if args.input_size:
        overrides["input_size"] = (args.input_size, args.input_size)
    cfg = dataclasses.replace(base, **overrides)
    from fgvc_tpu.utils.profiler import trace

    with trace(args.profile):
        results = run_task(
            args.task,
            args.data_root,
            checkpoint=args.checkpoint,
            list_path=args.list_path,
            max_videos=args.max_videos,
            output_dir=args.output_dir,
            test_cfg=cfg,
            model=args.model,
            query_mode=args.query_mode,
            local_devices=args.local_devices,
            spatial_devices=args.spatial_devices,
            bank_devices=args.bank_devices,
            backbone=args.backbone,
            annotations=args.annotations,
        )
    print(json.dumps(results, indent=2, default=float))


if __name__ == "__main__":
    main()
