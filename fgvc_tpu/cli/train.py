#!/usr/bin/env python
"""Training CLI — the tools/train.py of the framework.

Mirrors the reference's interface shape (/root/reference/tools/train.py):

    python tools/train.py --ytv-root <dir> --flyingthings-root <dir> \
        --work-dir runs/mixed [--resume] [--teacher ckpt.pth]

With --synthetic (no datasets mounted) it trains on noise — useful for
smoke tests and throughput measurement.  Data parallelism spans all local
devices automatically (batch must divide the device count).
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="fgvc_tpu mixed training")
    parser.add_argument("--ytv-root", default=None)
    parser.add_argument("--flyingthings-root", default=None)
    parser.add_argument("--ytv-list", default=None)
    parser.add_argument("--work-dir", default="runs/mixed")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument(
        "--synthetic-mode",
        default="noise",
        choices=["noise", "structured", "movi"],
        help="structured = textured scenes with exact flow (real "
             "correspondence signal; convergence evidence), noise = iid "
             "noise (pure smoke test), movi = rec branch trains on MOVi "
             "scene-video pairs (--movi-root) while sup/adversarial keep "
             "the procedural flow-labeled domain — the reference's "
             "YTV+FlyingThings recipe shape",
    )
    parser.add_argument(
        "--movi-root", default=None,
        help="directory of generate_movi.py pickles for "
             "--synthetic-mode movi (use DIFFERENT scenes/seed than "
             "--val-data-root)",
    )
    parser.add_argument(
        "--config", default=None,
        help="JSON config file overlaid on the TrainConfig defaults (same "
             "knob names as fgvc_tpu.config.TrainConfig; the reference's "
             "Config.fromfile equivalent). Explicit flags win over the file")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="global batch (default 4)")
    parser.add_argument("--crop", type=int, default=None,
                        help="train crop size (default 256)")
    parser.add_argument("--radius", type=int, default=None,
                        help="correlation radius (default 24)")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--log-interval", type=int, default=50,
                        help="loss-log cadence (steps) — the reference's "
                             "log_config interval")
    parser.add_argument("--ckpt-interval", type=int, default=None,
                        help="checkpoint cadence (steps; default: half the "
                             "run)")
    parser.add_argument("--lr", type=float, default=None,
                        help="peak learning rate (default 1e-3)")
    parser.add_argument("--teacher", default=None,
                        help="teacher init: torch .pth, or an fgvc checkpoint "
                        "dir (its trained student becomes the frozen teacher "
                        "— the reference's staged recipe)")
    parser.add_argument("--teacher-ema", type=float, default=None)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--seed", type=int, default=None,
                        help="train seed (default 0)")
    parser.add_argument("--val-data-root", default=None,
                        help="TAP-Vid DAVIS shards for mid-training eval")
    parser.add_argument("--val-interval", type=int, default=None)
    parser.add_argument("--val-videos", type=int, default=4)
    parser.add_argument("--synthetic-val", action="store_true",
                        help="mid-train eval smoke on synthetic shards")
    parser.add_argument(
        "--precision",
        default=None,
        choices=["highest", "high", "default"],
        help="correlation matmul precision (high = bf16x3, tighter than "
             "the reference's A100 TF32 training; highest = full f32)",
    )
    parser.add_argument("--l1-weight", type=float, default=None,
                        help="reconstruction loss weight (config l1_loss)")
    parser.add_argument("--sup-weight", type=float, default=None,
                        help="distillation loss weight (config sup_loss)")
    parser.add_argument("--corr-da-weight", type=float, default=None,
                        help="adversarial corr-alignment weight")
    parser.add_argument("--grad-clip", type=float, default=None,
                        help="global-norm gradient clipping")
    parser.add_argument("--loss-scale", type=float, default=None,
                        help="static loss scaling (default 1.0)")
    parser.add_argument("--remat", action=argparse.BooleanOptionalAction,
                        default=None,
                        help="rematerialize backbone activations (bigger batches)")
    parser.add_argument("--fused-encoder",
                        action=argparse.BooleanOptionalAction, default=None,
                        help="one backbone call for the rec+sup pairs "
                             "(throughput mode; union-batch BN — not "
                             "recipe-parity, see TrainConfig.fused_encoder)")
    parser.add_argument("--check-numerics",
                        action=argparse.BooleanOptionalAction, default=None,
                        help="raise on the first non-finite loss/gradient "
                        "(detect_anomaly equivalent; costs a per-step sync)")
    parser.add_argument("--profile", default=None, metavar="LOGDIR",
                        help="write a jax.profiler device+host trace "
                             "(TensorBoard/xprof)")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host: jax.distributed coordinator address")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                        help="force a jax platform (the JAX_PLATFORMS env var "
                             "is overridden by device plugins in some "
                             "environments; the config API wins)")
    args = parser.parse_args()

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

    from fgvc_tpu.apis.train import (
        make_synthetic_val_fn,
        make_tapvid_val_fn,
        train_model,
    )
    from fgvc_tpu.config import TrainConfig
    from fgvc_tpu.datasets.flyingthings_ytv import (
        FlyingThingsYtvDataset,
        StructuredSyntheticMixedDataset,
        SyntheticMixedDataset,
        make_batches,
    )

    import dataclasses

    cfg = TrainConfig()
    if args.config:
        from fgvc_tpu.config import config_from_file

        cfg = config_from_file(args.config, cfg)
    flag_overrides = {
        k: v
        for k, v in (
            ("radius", args.radius),
            ("crop_size", args.crop),
            ("batch_size", args.batch_size),
            ("lr", args.lr),
            ("seed", args.seed),
            ("grad_clip", args.grad_clip),
            ("loss_weight_l1", args.l1_weight),
            ("loss_weight_sup", args.sup_weight),
            ("loss_weight_corr_da", args.corr_da_weight),
            ("matmul_precision", args.precision),
            ("loss_scale", args.loss_scale),
            ("remat", args.remat),
            ("fused_encoder", args.fused_encoder),
            ("check_numerics", args.check_numerics),
        )
        if v is not None
    }
    cfg = dataclasses.replace(cfg, **flag_overrides)

    if args.synthetic or not args.ytv_root:
        if args.synthetic_mode == "movi":
            from fgvc_tpu.datasets.flyingthings_ytv import MoviMixedDataset

            if not args.movi_root:
                parser.error("--synthetic-mode movi needs --movi-root")
            dataset = MoviMixedDataset(
                args.movi_root, crop=cfg.crop_size, seed=cfg.seed
            )
        else:
            ds_cls = (
                StructuredSyntheticMixedDataset
                if args.synthetic_mode == "structured"
                else SyntheticMixedDataset
            )
            dataset = ds_cls(crop=cfg.crop_size, seed=cfg.seed)
    else:
        dataset = FlyingThingsYtvDataset(
            args.ytv_root,
            args.flyingthings_root,
            ytv_list=args.ytv_list,
            crop=cfg.crop_size,
            seed=cfg.seed,
        )

    steps_per_epoch = args.steps_per_epoch or max(
        len(dataset) // cfg.batch_size, 1
    )
    total = args.max_steps or cfg.max_epochs * steps_per_epoch
    # resume fast-forwards the loader to the checkpointed step so the
    # continued run sees exactly the batches an uninterrupted run would
    skip = 0
    if not args.no_resume:
        from fgvc_tpu.core.checkpoint import latest_checkpoint

        latest = latest_checkpoint(args.work_dir)
        if latest:
            skip = min(int(os.path.basename(latest).split("_")[-1]), total)
    batches = make_batches(dataset, cfg.batch_size, total, skip=skip)

    if args.val_data_root:
        val_fn = make_tapvid_val_fn(
            args.val_data_root, max_videos=args.val_videos
        )
    elif args.synthetic_val:
        val_fn = make_synthetic_val_fn(args.work_dir, seed=cfg.seed)
    else:
        val_fn = None
    from fgvc_tpu.utils.profiler import trace

    with trace(args.profile):
        train_model(
            cfg,
            batches,
            args.work_dir,
            steps_per_epoch=steps_per_epoch,
            max_steps=args.max_steps,
            log_interval=args.log_interval,
            ckpt_interval=args.ckpt_interval,
            resume=not args.no_resume,
            teacher_init=args.teacher,
            teacher_ema=args.teacher_ema,
            val_fn=val_fn,
            val_interval=args.val_interval
            or (
                steps_per_epoch * max(cfg.max_epochs // 2, 1)
                if val_fn
                else None
            ),
        )


if __name__ == "__main__":
    main()
