"""Dataclass configuration for fgvc_tpu.

Replaces the reference's mmcv Config/registry system
(/root/reference/tools/test.py:135, configs/eval/res18_d1_eval.py) with plain
typed dataclasses.  Field names mirror the reference's ``test_cfg`` knobs so a
user of the reference finds the same dials.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """Mirror of the reference ResNet backbone dict."""

    depth: int = 18
    strides: Sequence[int] = (1, 1, 1, 4)
    out_indices: Sequence[int] = (2,)
    pool_type: str = "none"
    in_channels: int = 3


@dataclasses.dataclass(frozen=True)
class TestConfig:
    """Mirror of test_cfg_* (/root/reference/configs/eval/res18_d1_eval.py:12).

    ``step`` remains the memory/speed dial of the chunked attention;
    ``neighbor_range`` is the full diameter (radius = neighbor_range // 2).
    """

    precede_frames: int = 5
    topk: int = 10
    temperature: float = 0.07
    neighbor_range: int = 30
    step: int = 512
    # with_first=False drops frame 0 from the key window (key = the last
    # `precede_frames` frames only, shorter in the first steps — reference
    # vanilla_tracker.py:353-362 key_start:frame_idx without the frame-0
    # concat). Implemented by invalidating the first key slot, which
    # reproduces the reference's variable-length window exactly.
    with_first: bool = True
    with_first_neighbor: bool = True
    with_norm: bool = True
    # hard_prop (VOS): each step's bank entry is argmax→one-hot re-encoded
    # before re-use as a propagation value; the emitted per-frame decode
    # still comes from the soft logits (reference vanilla_tracker.py:81,
    # 762-765: only seg_bank gets the hard version).
    hard_prop: bool = False
    sigma: float = 6.0  # gaussian query heatmap std-dev (full-res pixels)
    input_size: Tuple[int, int] = (256, 256)  # (H, W) network input
    # Static-shape bucketing (TPU): videos/points are padded up to multiples.
    frame_bucket: int = 32
    point_bucket: int = 32
    # Attention implementation: 'pallas' (single-pass fused TPU kernel,
    # exact incl. duplicate-key tie handling — ~2.6x the XLA tiled path),
    # 'tiled' (windowed XLA fast path, identical numerics), or 'dense'
    # (reference-shaped chunked kernel).
    attention_impl: str = "pallas"
    # save_mem: stream features inside the propagation scan (window-bounded
    # memory, no full bank) — for full-res VOS over long videos; TPU
    # re-design of the reference's per-chunk recompute mode
    # (local_attention.py:883-1006).
    save_mem: bool = False
    # decode: 'upsample' = reference-exact (bilinear to full res, then
    # top-5 soft-argmax); 'coarse' = soft-argmax on feature-res logits
    # scaled by stride (skips the per-frame full-res resize; ~1-2 ms/frame
    # faster, metric delta pending a real-data check like the other
    # approximate modes).
    decode_impl: str = "upsample"
    tile: int = 32  # query tile edge for the tiled kernel
    # Upload wire format (TPU-systems knob, no reference counterpart):
    # 'rgb' = uint8 RGB (3 B/px, reference-exact pixels); 'yuv420' = I420
    # chroma-subsampled planes (1.5 B/px — halves the host→device bytes,
    # the eval bottleneck through this environment's tunnel link).  Source
    # TAP-Vid videos are JPEG, i.e. already 4:2:0-subsampled; the measured
    # metric delta is in docs/precision_study.md.
    upload_format: str = "rgb"
    # 'highest' = full f32 on MXU (parity); 'default' = bf16 multiplies.
    matmul_precision: str = "highest"
    # 'exact' = lax.top_k + value gather (bit-parity with the reference);
    # 'segmented' = EXACT segment-max prefiltered top-k + gather-free
    # thresholded value matmul (identical results except on exact affinity
    # ties at the k-th value — measure-zero for real features);
    # 'approx' = TPU PartialReduce approx_max_k + gather-free threshold
    # weights (DISQUALIFIED by docs/precision_study.md: −2.4 <D; kept as an
    # explicitly-requested mode only).  'exact' is the measured-fastest
    # exact XLA path on TPU (segmented's prefilter gather costs more than
    # it saves — docs/kernel_roadmap.md dead ends).
    topk_impl: str = "exact"
    # Coarse-to-fine two-stage inference (attention_impl='c2f'): the coarse
    # stage runs on `c2f_scale`× average-pooled features, the fine stage
    # gathers (2·radius_fine+1)² fine patches around each coarse argmax
    # (reference masked_attention_efficient_c2f, local_attention.py:721-880
    # — which has no in-tree consumer; this wiring is ours).
    c2f_scale: int = 4
    radius_fine: int = 12
    # c2f query-pixel chunk (memory dial of the fine-stage gather)
    c2f_step: int = 256
    # Flow-guided propagation (attention_impl='flow_guided'): each key
    # frame contributes a (2·flow_radius+1)² candidate window centered at a
    # flow-predicted position instead of the radius-masked neighborhood
    # (reference flow_guided_attention_efficient, local_attention.py:512-718
    # — no in-tree consumer there; this wiring is ours).  Adjacent-frame
    # flows come from the feature bank's own local-correlation expected
    # displacement (top-k softmax over the neighbor_range window) and are
    # chained to the window frames (ops/warp.py chain_window_flows — the
    # step the reference's empty tools/data/ytv/chain_flow.py names).
    flow_radius: int = 6
    # flow-guided query-pixel chunk (memory dial of the window gather)
    flow_step: int = 1024
    # Visibility prediction for point tracking (track_points):
    # 'none' = constant-zero visibilities — reference parity (the reference's
    # VanillaTracker.forward_test returns no occlusion estimate, so its AJ/OA
    # are degenerate; /root/reference/mmpt/models/trackers/
    # vanilla_tracker.py:227-303); 'heatmap' = predict visibility from the
    # propagated heatmap's peak response: a point counts visible at frame t
    # when max(logits_t) / max(logits_query_frame) >= visibility_threshold.
    # The peak is a free by-product of the propagation scan (one (h, w)
    # reduction per point).  The 0.5 default is the AJ-best threshold on
    # synthetic MOVi scenes with ground-truth occlusion for BOTH random
    # and trained features (docs/visibility_study.md; 128² CPU
    # calibration — re-check at 256² on TPU before trusting it on real
    # data).
    visibility_mode: str = "none"
    visibility_threshold: float = 0.5
    # On-device preprocessing applied to uint8 uploads: 'lab' = RGB→Lab +
    # the shipped eval normalization (configs/eval/base_data.py:3-13);
    # 'imagenet' = standard RGB mean/std — what the non-Lab backbone
    # ablations (DINO/ViT zoo) expect.  float32 input bypasses both.
    preprocess: str = "lab"


DAVIS_TEST_CFG = TestConfig(step=512)
KINETICS_TEST_CFG = TestConfig(step=128)
JHMDB_TEST_CFG = TestConfig(step=128, input_size=(320, 320))
BADJA_TEST_CFG = TestConfig(step=128)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Mirror of the mixed-training recipe
    (/root/reference/configs/train/mixed_train_res18_d1_l2_rec_ytv_fly.py)."""

    # model
    radius: int = 24
    downsample_rate: int = 2
    scale: int = 2  # supervised-branch sampling stride on full-res flow
    temperature_t: float = 0.07
    rec_weight: float = 20.0  # smooth-l1 photometric scaling ('weight')
    loss_weight_l1: float = 1.0
    loss_weight_sup: float = 1.0
    loss_weight_corr_da: float = 1.0
    bilateral: bool = False
    norm: bool = True
    # optimization
    lr: float = 1e-3
    betas: Tuple[float, float] = (0.9, 0.999)
    max_epochs: int = 30
    # REFERENCE QUIRK: the shipped config sets warmup_iters/ratio but omits
    # the mmcv `warmup` POLICY key, so LrUpdaterHook never applies warmup —
    # the released model trained with pure cosine annealing from step 0.
    # warmup=None reproduces that; warmup='linear' enables the (apparently
    # intended) 10-epoch linear warmup.
    warmup: Optional[str] = None
    warmup_epochs: int = 10
    warmup_ratio: float = 0.1
    # Numerics sanitizer — the reference trains with
    # torch.autograd.set_detect_anomaly(True) unconditionally on
    # (/root/reference/tools/train.py:69).  The jit-compatible equivalent:
    # every step additionally reduces an all-gradients-finite flag, and the
    # host loop raises FloatingPointError on the first non-finite step
    # (which costs a per-step device sync — opt-in, like a sanitizer).
    check_numerics: bool = False
    min_lr_ratio: float = 0.001
    batch_size: int = 4  # global batch (reference: 1/GPU × 4 GPUs)
    crop_size: int = 256
    seed: int = 0
    # OptimizerHook_Custom options (/root/reference/mmpt/core/optimizer/
    # opz_hook.py:26-155): global-norm gradient clipping and static loss
    # scaling (the Fp16OptimizerHook equivalent; bf16 on TPU rarely needs it)
    grad_clip: Optional[float] = None
    loss_scale: float = 1.0
    # Training matmul precision for the radius-24 correlation volumes:
    # 'high' (bf16x3, ~2^-21 relative) is strictly TIGHTER than the TF32
    # matmuls the reference's A100 training used (torch 1.9 enables TF32
    # by default, ~2^-10 mantissa); 'highest' = full f32 for exactness
    # studies. Eval-path correlations keep their own HIGHEST default.
    matmul_precision: str = "high"
    # Backbone COMPUTE dtype: 'bfloat16' runs the student/teacher conv
    # stacks in bf16 (parameters, optimizer state, BatchNorm statistics and
    # every loss stay float32 — flax param_dtype master weights; loss math
    # upcasts the features).  The TPU-native equivalent of the reference's
    # Fp16OptimizerHook AMP mode (opz_hook.py:74-155), except bf16's f32
    # exponent range makes the loss-scaling dance unnecessary (loss_scale
    # stays available regardless).  Measured on v5e-1: see
    # CLAUDE.md "Training-step numbers".
    compute_dtype: str = "float32"
    # rematerialize backbone activations in the backward pass — trades
    # ~30% step time for activation memory, enabling larger global batches
    # per chip (jax.checkpoint on the student forward)
    remat: bool = False
    # Opt-in throughput mode: run the rec and sup pairs through ONE
    # student backbone call per step (one 4B-frame batch) instead of two
    # sequential 2B-frame passes.  NOT recipe-parity: BatchNorm statistics
    # are then computed over the union batch and updated once per step,
    # where the reference (and the default here) normalizes and updates
    # per branch sequentially (mixed_tracker.py:375-457 runs two separate
    # student forwards).  Same objective, different BN trajectory.
    fused_encoder: bool = False


def config_from_file(path: str, base):
    """Overlay a JSON config file onto a base config dataclass.

    The reference's user surface is a config FILE (mmcv Config.fromfile,
    /root/reference/tools/test.py:75, tools/train.py:64); the fgvc_tpu
    equivalent is a JSON object of the SAME knob names overlaid on the task
    preset (TestConfig) or recipe default (TrainConfig):

        {"topk": 10, "neighbor_range": 30, "matmul_precision": "high"}

    Unknown keys fail loudly — a silently-ignored knob is a parity trap.
    Lists coerce to tuples for tuple-typed fields (JSON has no tuples).
    CLI layering: preset -> file -> explicitly-passed flags.
    """
    import json

    with open(path) as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError(f"{path}: expected a JSON object of config fields")
    valid = {f.name for f in dataclasses.fields(base)}
    unknown = sorted(set(data) - valid)
    if unknown:
        raise ValueError(
            f"{path}: unknown {type(base).__name__} field(s) {unknown}; "
            f"valid: {sorted(valid)}"
        )
    coerced = {
        k: tuple(v)
        if isinstance(v, list) and isinstance(getattr(base, k), tuple)
        else v
        for k, v in data.items()
    }
    return dataclasses.replace(base, **coerced)
