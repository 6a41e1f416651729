"""Evaluation harness: build tracker, iterate dataset, aggregate metrics.

Replaces the reference's tools/test.py + apis/test.py single/multi-GPU test
loops (/root/reference/mmpt/apis/test.py:13,62) with:

  * one Tracker per task config (the eval twin of VanillaTracker /
    HRVanillaTracker),
  * a host loop over videos dispatching fully-jitted per-video work,
  * multi-process sharding: each process takes videos [rank::world]
    (the DistributedSampler pattern, samplers/distributed_sampler.py:9) and
    results are merged by the caller or via process_allgather when
    jax.distributed is initialized.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from fgvc_tpu.config import (
    BADJA_TEST_CFG,
    DAVIS_TEST_CFG,
    JHMDB_TEST_CFG,
    KINETICS_TEST_CFG,
    TestConfig,
)
from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1
from fgvc_tpu.models.torch_convert import (
    convert_resnet_state_dict,
    load_torch_state_dict,
)
from fgvc_tpu.models.tracker import Tracker

TASK_CONFIGS: Dict[str, TestConfig] = {
    "davis": DAVIS_TEST_CFG,
    "kinetics": KINETICS_TEST_CFG,
    "jhmdb": JHMDB_TEST_CFG,
    "badja": BADJA_TEST_CFG,
    "vos": DAVIS_TEST_CFG,
}


def _restore_orbax(checkpoint: str):
    """Restore an orbax checkpoint dir as HOST numpy arrays.

    A work_dir pointer FILE ('best' / 'latest' hold "step_N", written by
    apis/train.py) resolves to the sibling step directory first.  Arrays
    restore as np.ndarray (not jax.Array): a checkpoint saved on TPU
    carries TPU shardings in its metadata, and a device-targeted restore
    on a CPU-only host fails with 'Device TPU ... not found'; numpy is
    device-agnostic and jit device-puts the variables on first use."""
    import os

    import orbax.checkpoint as ocp

    if os.path.isfile(checkpoint):
        with open(checkpoint) as f:
            target = f.read().strip()
        checkpoint = os.path.join(os.path.dirname(checkpoint), target)
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(checkpoint)
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    return ckptr.restore(path, restore_args=restore_args)


def build_tracker(
    test_cfg: TestConfig,
    checkpoint: Optional[str] = None,
    seed: int = 0,
    spatial_mesh=None,
    bank_mesh=None,
    backbone: str = "resnet18_d1",
) -> Tracker:
    """Tracker over any zoo encoder (default: the paper's ResNet-18-d1);
    loads a torch .pth, an orbax dir, or a work_dir 'best'/'latest'
    pointer if given.  Non-default backbones route through
    models.zoo.make_eval_backbone, which also switches the on-device
    preprocessing to what that encoder family expects (the reference
    swaps the config's backbone dict + Normalize pipeline the same way)."""
    import dataclasses

    if backbone != "resnet18_d1":
        from fgvc_tpu.models.zoo import make_eval_backbone

        apply_fn, variables, pre = make_eval_backbone(
            backbone, checkpoint, input_hw=test_cfg.input_size, seed=seed
        )
        if test_cfg.preprocess != pre:
            test_cfg = dataclasses.replace(test_cfg, preprocess=pre)
        return Tracker(
            apply_fn, variables, test_cfg,
            spatial_mesh=spatial_mesh, bank_mesh=bank_mesh,
        )
    model = resnet18_d1()
    if checkpoint and checkpoint.endswith(".pth"):
        state = load_torch_state_dict(checkpoint)
        variables = convert_resnet_state_dict(state)
    elif checkpoint:
        variables = _restore_orbax(checkpoint)
        if "backbone" in variables.get("params", {}):
            variables = {
                "params": variables["params"]["backbone"],
                "batch_stats": variables["batch_stats"],
            }
    else:
        variables = init_resnet_params(
            model, jax.random.PRNGKey(seed), test_cfg.input_size
        )
    return Tracker(
        lambda v, x: model.apply(v, x, train=False),
        variables,
        test_cfg,
        spatial_mesh=spatial_mesh,
        bank_mesh=bank_mesh,
    )


def build_raft_tracker(checkpoint: Optional[str] = None, iters: int = 12, seed: int = 0):
    """RAFT baseline tracker (reference trackers/raft.py:222-288).

    Loads a torch RAFT .pth (official naming) or an orbax dir when given.
    """
    from fgvc_tpu.models.raft import RaftTracker

    variables = None
    if checkpoint and checkpoint.endswith(".pth"):
        from fgvc_tpu.models.torch_convert import load_torch_state_dict
        from fgvc_tpu.models.raft_convert import convert_raft_state_dict

        variables = convert_raft_state_dict(load_torch_state_dict(checkpoint))
    elif checkpoint:
        variables = _restore_orbax(checkpoint)
    # official checkpoints carry a batch-normed context encoder
    cnet_norm = "batch" if variables and "batch_stats" in variables else "none"
    return RaftTracker(variables, iters=iters, seed=seed, cnet_norm=cnet_norm)


def _my_videos(n: int, rank: int, world: int, max_videos=None):
    """This rank's video ids. `max_videos` truncates the GLOBAL id list
    before sharding, so the evaluated set is identical at any world size."""
    ids = list(range(n if max_videos is None else min(n, max_videos)))
    return ids[rank::world]


def _merge_shards(pairs):
    """Gather (video_idx, payload) pairs from every process, sorted by idx.

    The collect_results step (/root/reference/mmpt/apis/test.py:131-236):
    per-rank shards are exchanged so every process scores the FULL result
    set — without this a multi-process run would silently report
    rank-local metrics.
    """
    from fgvc_tpu.parallel.dist import allgather_objects

    pairs = sorted(allgather_objects(pairs), key=lambda p: p[0])
    return [p[0] for p in pairs], [p[1] for p in pairs]


def _read_ahead(dataset, ids):
    """Yield dataset[i] for i in ids, reading ONE video ahead on a worker
    thread.

    The eval loops interleave host work (dataset pickle/JPEG/resize) with
    device work; without read-ahead the next video's decode sits exactly
    in the device-idle gap after a video's results land.  cv2, the native
    fgpack decoder, and numpy all release the GIL, so the worker genuinely
    overlaps the main thread's JAX dispatch.  This is the TPU-host
    equivalent of the reference's DataLoader worker processes
    (/root/reference/mmpt/datasets/builder.py:96 workers_per_gpu)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = None
        for n, i in enumerate(ids):
            cur = fut.result() if fut is not None else dataset[i]
            fut = (
                ex.submit(dataset.__getitem__, ids[n + 1])
                if n + 1 < len(ids)
                else None
            )
            yield cur


def _entry_device(entry):
    """Dispatch placement for one round-robin slot: a plain device pins
    there; a GROUP entry (dp×sp) returns None so the group tracker's own
    'space'-mesh sharding takes over."""
    return None if isinstance(entry, (list, tuple)) else entry


def device_trackers(tracker: Tracker, devices):
    """One Tracker clone per round-robin slot — the single-process
    data-parallel eval fleet.  The reference needs one torch.distributed
    process per GPU for this (apis/test.py multi_gpu_test); here devices
    are just dispatch targets.

    Each entry is either a single jax.Device (plain dp: variables
    device_put there) or a SEQUENCE of devices (dp×sp: the entry becomes
    a per-group 'space' mesh — videos round-robin over groups while each
    group shards its video's query rows, combining the two scaling axes
    on one pod slice)."""
    import jax as _jax
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if tracker.spatial_mesh is not None:
        raise ValueError(
            "pass device GROUPS instead of building the base tracker on a "
            "spatial mesh: the round-robin fleet derives one 'space' mesh "
            "per group entry"
        )
    out = []
    for d in devices:
        if isinstance(d, (list, tuple)):
            mesh = Mesh(_np.array(list(d)), ("space",))
            out.append(
                Tracker(
                    tracker.apply_fn,
                    _jax.device_put(
                        tracker.variables, NamedSharding(mesh, PartitionSpec())
                    ),
                    tracker.cfg,
                    spatial_mesh=mesh,
                )
            )
        else:
            out.append(
                Tracker(
                    tracker.apply_fn,
                    _jax.device_put(tracker.variables, d),
                    tracker.cfg,
                )
            )
    return out


def eval_tapvid(
    tracker: Tracker, dataset, max_videos=None, rank=0, world=1,
    output_dir=None, devices=None,
) -> Dict[str, float]:
    """TAP-Vid DAVIS / Kinetics point tracking.

    Videos are pipelined one deep: while video i propagates, video i+1's
    host→device upload and feature extraction are already dispatched
    (the TPU equivalent of the reference's CPU-bank prefetch).

    `devices` (2+ local devices) switches to single-process data-parallel
    eval: videos round-robin across the devices with a device-deep
    in-flight window — dispatch is async, so all chips propagate
    concurrently while the host feeds them."""
    results = []
    ids = _my_videos(len(dataset), rank, world, max_videos)
    if devices is not None and len(devices) > 1:
        return _eval_tapvid_multidevice(
            tracker, dataset, ids, devices, output_dir
        )

    reader = _read_ahead(dataset, ids)

    def load():
        sample = next(reader)
        has_feats = hasattr(tracker, "_features_padded")
        feats = tracker._features_padded(sample["video"]) if has_feats else None
        return sample, feats

    from fgvc_tpu.utils.profiler import annotate

    nxt = load() if ids else None
    can_dispatch = hasattr(tracker, "track_points_dispatch")
    for n, i in enumerate(ids):
        sample, feats = nxt
        t0 = time.time()
        # SCAN-FIRST dispatch order (measured +18 fps in the f32 mode,
        # tools/bench/upload_overlap.py): enqueue this video's propagation
        # BEFORE the next video's upload+backbone — on the in-order device
        # queue the transfer then streams behind the scan instead of the
        # scan waiting behind the transfer.
        with annotate(f"propagate[{i}]"):
            dp = (
                tracker.track_points_dispatch(
                    sample["video"], sample["query_points"], feats=feats
                )
                if can_dispatch
                else None
            )
        # named spans for --profile traces: upload+features vs propagation
        # separate visually in trace_viewer (utils/profiler.annotate);
        # load() dispatches the NEXT video's upload+backbone
        with annotate("upload+features[next]"):
            nxt = load() if n + 1 < len(ids) else None
        with annotate(f"collect[{i}]"):
            out = (
                tracker.track_points_collect(dp)
                if can_dispatch
                # Trackers without the dispatch/collect split (e.g.
                # RaftTracker) may not accept a feats= kwarg; only forward
                # it when the loader actually produced features.
                else tracker.track_points(
                    sample["video"],
                    sample["query_points"],
                    **({"feats": feats} if feats is not None else {}),
                )
            )
        print(
            f"[{i}] T={len(sample['video'])} P={sample['query_points'].shape[0]}"
            f" {time.time() - t0:.2f}s",
            flush=True,
        )
        results.append((i, _pack_result(sample, out)))
        if output_dir and n == 0:
            # PIPs Summ_writer-style trajectory render of the first video
            # (reference tapvid.py:206-300 writes per-video track videos)
            _write_track_video(
                sample["video"], out["trajectories"], output_dir, i
            )
    idxs, results = _merge_shards(results)
    return dataset.evaluate(results, output_dir=output_dir, indices=idxs)


def _pack_result(sample, out):
    return {
        "trajectories_gt": sample["trajectories"],
        "visibilities_gt": sample["visibilities"],
        "trajectories_pred": out["trajectories"],
        "visibilities_pred": out["visibilities"],
        "query_points": sample["query_points"],
    }


def _round_robin(ids, devices, dispatch_fn, collect_fn):
    """The data-parallel in-flight window shared by every eval task:
    dispatch video n on device n%D asynchronously, collect once D videos
    are in flight (so all devices stay busy), drain at the end.

    dispatch_fn(i, dslot) -> (payload, disp); collect_fn(i, dslot, payload,
    disp) consumes one finished video."""
    from collections import deque

    D = len(devices)
    inflight: deque = deque()
    for n, i in enumerate(ids):
        payload, disp = dispatch_fn(i, n % D)
        inflight.append((i, n % D, payload, disp))
        while len(inflight) >= D:
            collect_fn(*inflight.popleft())
    while inflight:
        collect_fn(*inflight.popleft())


def _eval_tapvid_multidevice(tracker, dataset, ids, devices, output_dir):
    """Round-robin videos over local devices with async dispatch; collect
    behind a devices-deep in-flight window."""
    trackers = device_trackers(tracker, devices)
    results = []
    t_start = time.time()
    frames = [0]

    def dispatch(i, dslot):
        tr = trackers[dslot]
        sample = dataset[i]
        feats = tr._features_padded(
            sample["video"], device=_entry_device(devices[dslot])
        )
        frames[0] += len(sample["video"])
        return sample, tr.track_points_dispatch(
            sample["video"], sample["query_points"], feats=feats
        )

    def collect(j, dslot, sample, dp):
        out = trackers[dslot].track_points_collect(dp)
        results.append((j, _pack_result(sample, out)))
        if output_dir and not results[:-1]:
            _write_track_video(
                sample["video"], out["trajectories"], output_dir, j
            )

    _round_robin(ids, devices, dispatch, collect)
    dt = time.time() - t_start
    print(
        f"[dp-eval] {len(ids)} videos / {frames[0]} frames over "
        f"{len(devices)} devices in {dt:.2f}s "
        f"({frames[0] / max(dt, 1e-9):.1f} fps aggregate)",
        flush=True,
    )
    idxs, results = _merge_shards(results)
    return dataset.evaluate(results, output_dir=output_dir, indices=idxs)


def _write_track_video(video, trajectories, output_dir, idx):
    try:
        import os

        from fgvc_tpu.utils.visualize import (
            draw_trajectory_tails,
            paint_point_track,
            save_video,
        )

        os.makedirs(output_dir, exist_ok=True)
        tracks = np.transpose(trajectories, (1, 0, 2))  # (P, T, 2)
        vid = paint_point_track(np.asarray(video), tracks)
        vid = draw_trajectory_tails(vid, tracks)
        save_video(vid, os.path.join(output_dir, f"tracks_{idx:04d}.mp4"))
    except Exception:
        pass  # visualization is best-effort


def _heatmap_eval_loop(tracker, dataset, ids, devices=None):
    """Shared JHMDB/BADJA loop with one-deep video prefetch (upload +
    feature extraction of video i+1 dispatch while video i propagates);
    with `devices`, videos round-robin across local devices (the
    single-process data-parallel eval, like _eval_tapvid_multidevice)."""
    if devices is not None and len(devices) > 1:
        trackers = device_trackers(tracker, devices)
        out = []

        def dispatch(i, dslot):
            tr = trackers[dslot]
            sample = dataset[i]
            feats = tr._features_padded(
                sample["video"], device=_entry_device(devices[dslot])
            )
            return None, tr.track_heatmaps_dispatch(
                sample["video"],
                sample["ref_maps"],
                tuple(sample["original_shape"]),
                feats=feats,
            )

        def collect(j, dslot, _payload, dp):
            out.append((j, trackers[dslot].track_heatmaps_collect(dp)))

        _round_robin(ids, devices, dispatch, collect)
        return sorted(out, key=lambda p: p[0])

    reader = _read_ahead(dataset, ids)

    def load():
        sample = next(reader)
        feats = (
            tracker._features_padded(sample["video"])
            if hasattr(tracker, "_features_padded")
            else None
        )
        return sample, feats

    out = []
    nxt = load() if ids else None
    for n, i in enumerate(ids):
        sample, feats = nxt
        nxt = load() if n + 1 < len(ids) else None
        coords = tracker.track_heatmaps(
            sample["video"],
            sample["ref_maps"],
            tuple(sample["original_shape"]),
            feats=feats,
        )
        out.append((i, coords))
    return out


def eval_jhmdb(
    tracker: Tracker, dataset, max_videos=None, rank=0, world=1,
    output_dir=None, devices=None,
) -> Dict[str, float]:
    ids = _my_videos(len(dataset), rank, world, max_videos)
    preds = [
        (i, np.transpose(c, (2, 1, 0)))  # (2, P, T)
        for i, c in _heatmap_eval_loop(tracker, dataset, ids, devices)
    ]
    idxs, preds = _merge_shards(preds)
    return dataset.evaluate(preds, indices=idxs, output_dir=output_dir)


def eval_badja(
    tracker: Tracker, dataset, max_videos=None, rank=0, world=1,
    output_dir=None, devices=None,
) -> Dict[str, float]:
    ids = _my_videos(len(dataset), rank, world, max_videos)
    preds = _heatmap_eval_loop(tracker, dataset, ids, devices)  # (T, P, 2) @ input size
    idxs, preds = _merge_shards(preds)
    return dataset.evaluate(preds, indices=idxs, output_dir=output_dir)


def eval_vos(
    tracker: Tracker, dataset, max_videos=None, rank=0, world=1,
    output_dir=None, devices=None,
) -> Dict[str, float]:
    """Masks are SCORED locally per rank and only the small per-video J&F
    stats cross processes — full-resolution mask stacks are hundreds of MB
    and would crawl through the host link if allgathered raw.

    `devices` round-robins videos across local devices (the mask stacks
    come back per device; scoring stays on the host)."""
    from fgvc_tpu.core.metrics.vos import aggregate_jf

    stats = []
    ids = _my_videos(len(dataset), rank, world, max_videos)
    if devices is not None and len(devices) > 1:
        trackers = device_trackers(tracker, devices)

        def dispatch(i, dslot):
            sample = dataset[i]
            return None, trackers[dslot].track_masks_dispatch(
                sample["video"],
                sample["first_mask"],
                tuple(sample["original_shape"]),
                sample["num_objects"],
                device=_entry_device(devices[dslot]),
            )

        def collect(j, dslot, _payload, dp):
            masks = trackers[dslot].track_masks_collect(dp)
            s = dataset.score_video(j, masks)
            if s is not None:
                stats.append((j, s))

        _round_robin(ids, devices, dispatch, collect)
        stats.sort(key=lambda p: p[0])
        ids = []  # the loop below is the single-device path
    for i, sample in zip(ids, _read_ahead(dataset, ids)):
        masks = tracker.track_masks(
            sample["video"],
            sample["first_mask"],
            tuple(sample["original_shape"]),
            sample["num_objects"],
        )
        s = dataset.score_video(i, masks)
        if s is not None:
            stats.append((i, s))
    _, stats = _merge_shards(stats)
    results = aggregate_jf(stats)
    if output_dir:
        import os as _os

        _os.makedirs(output_dir, exist_ok=True)
        with open(_os.path.join(output_dir, "result.txt"), "a") as f:
            for k, v in results.items():
                f.write(f"{k}: {v}\n")
    return results


def run_task(
    task: str,
    data_root: str,
    checkpoint: Optional[str] = None,
    list_path: Optional[str] = None,
    max_videos: Optional[int] = None,
    output_dir: Optional[str] = None,
    test_cfg: Optional[TestConfig] = None,
    model: str = "vanilla",
    query_mode: str = "first",
    local_devices: Optional[int] = None,
    spatial_devices: Optional[int] = None,
    bank_devices: Optional[int] = None,
    backbone: str = "resnet18_d1",
    annotations: Optional[str] = None,
) -> Dict[str, float]:
    """Mirror of `tools/test.py --task ...` (tools/test.py:121-198).

    model='raft' evaluates the RAFT flow-chaining baseline instead of the
    label-propagation tracker (point-tracking tasks only).

    query_mode='strided' samples a query every 5 frames per track (reference
    sample_queries_strided, tapvid_evaluation_datasets.py:283); frames
    before a query stay zero-predicted, as in the reference's forward-only
    propagation, and the metrics switch to the strided protocol.

    annotations (kinetics only) evaluates --data-root's video clips
    directly against the released CSV (datasets/tapvid_kinetics.py),
    skipping pickle materialization.

    local_devices round-robins whole videos over local devices (throughput
    scaling); spatial_devices shards each frame's query rows over a 'space'
    mesh (single-video latency scaling).  Giving BOTH composes them on one
    pod slice: local_devices GROUPS of spatial_devices chips each — videos
    round-robin over the groups while every group row-shards its video
    (needs local_devices × spatial_devices local devices).

    bank_devices shards the feature BANK's frames over a 'bank' mesh
    (HBM capacity scaling: banks larger than one chip fit; distributed
    exact top-k, models/tracker.py _scan_propagate_bank).  Exclusive with
    the other two axes; attention_impl 'tiled' only.
    """
    from fgvc_tpu.parallel.dist import process_info

    rank, world = process_info()
    if query_mode != "first" and task not in ("davis", "kinetics"):
        raise ValueError(
            f"--query-mode {query_mode!r} only applies to TAP-Vid point "
            f"tracking (davis/kinetics), not task {task!r}"
        )
    if annotations and task != "kinetics":
        raise ValueError(
            "--annotations (CSV + clips mode) applies to --task kinetics "
            f"only, not {task!r}"
        )
    # report artifacts are written once (rank 0) — every rank still scores
    # the merged results, like the reference's rank-0 dataset.evaluate
    if rank != 0:
        output_dir = None
    cfg = test_cfg or TASK_CONFIGS[task]
    G = local_devices if local_devices and local_devices > 1 else 1
    S = spatial_devices if spatial_devices and spatial_devices > 1 else 1
    if model == "raft" and (G > 1 or S > 1):
        raise ValueError(
            "--local-devices/--spatial-devices apply to the "
            "label-propagation tracker only (RaftTracker has no "
            "dispatch/collect split yet)"
        )
    if G * S > len(jax.local_devices()):
        raise ValueError(
            f"{G} video groups × {S}-way row sharding needs {G * S} local "
            f"devices, have {len(jax.local_devices())}"
        )
    bank_mesh = None
    if bank_devices and bank_devices > 1:
        if G > 1 or S > 1 or model == "raft":
            raise ValueError(
                "--bank-devices is exclusive with --local-devices/"
                "--spatial-devices and applies to the label-propagation "
                "tracker only"
            )
        if bank_devices > len(jax.local_devices()):
            raise ValueError(
                f"{bank_devices}-way bank sharding needs {bank_devices} "
                f"local devices, have {len(jax.local_devices())}"
            )
        if cfg.attention_impl != "tiled":
            # fail here with the flag to flip, not later from the Tracker
            # constructor (the task defaults say attention_impl='pallas')
            raise ValueError(
                "--bank-devices needs the tiled attention kernel; pass "
                "--attention-impl tiled (bank sharding is implemented for "
                f"attention_impl='tiled', config says {cfg.attention_impl!r})"
            )
        import numpy as _np
        from jax.sharding import Mesh

        bank_mesh = Mesh(
            _np.array(jax.local_devices()[:bank_devices]), ("bank",)
        )
    spatial_mesh = None
    devices = None
    if G == 1 and S > 1:
        # single sp group: the base tracker itself runs on the mesh
        import numpy as _np
        from jax.sharding import Mesh

        spatial_mesh = Mesh(_np.array(jax.local_devices()[:S]), ("space",))
    elif G > 1:
        # dp (whole videos over groups) × optional sp (rows within a group):
        # device_trackers turns sequence entries into per-group 'space'
        # meshes; S == 1 degenerates to the plain per-device round-robin
        devs = jax.local_devices()[: G * S]
        devices = (
            [tuple(devs[g * S : (g + 1) * S]) for g in range(G)]
            if S > 1
            else devs
        )
    if model == "raft":
        if task not in ("davis", "kinetics"):
            raise ValueError("--model raft supports point-tracking tasks only")
        tracker = build_raft_tracker(checkpoint)
    else:
        tracker = build_tracker(
            cfg, checkpoint, spatial_mesh=spatial_mesh,
            bank_mesh=bank_mesh, backbone=backbone,
        )
    if task in ("davis", "kinetics"):
        from fgvc_tpu.datasets.tapvid import TapVidDataset

        # forward the config's input size so a test_cfg override (e.g. the
        # synthetic calibration studies, smoke tests) resizes the videos to
        # the resolution the tracker was configured for — at the task
        # defaults this is a no-op (both sides say 256²)
        if annotations:
            from fgvc_tpu.datasets.tapvid_kinetics import (
                TapVidKineticsVideoDataset,
            )

            ds = TapVidKineticsVideoDataset(
                data_root, annotations, query_mode=query_mode,
                input_size=cfg.input_size,
            )
        else:
            ds = TapVidDataset(
                data_root, subset_name=task, query_mode=query_mode,
                input_size=cfg.input_size,
            )
        return eval_tapvid(
            tracker, ds, max_videos, rank=rank, world=world,
            output_dir=output_dir, devices=devices,
        )
    if task == "jhmdb":
        from fgvc_tpu.datasets.jhmdb import JhmdbDataset

        ds = JhmdbDataset(
            data_root, list_path or data_root, input_size=cfg.input_size
        )
        return eval_jhmdb(
            tracker, ds, max_videos, rank=rank, world=world,
            output_dir=output_dir, devices=devices,
        )
    if task == "badja":
        from fgvc_tpu.datasets.badja import BadjaDataset

        ds = BadjaDataset(data_root, list_path or data_root)
        return eval_badja(
            tracker, ds, max_videos, rank=rank, world=world,
            output_dir=output_dir, devices=devices,
        )
    if task == "vos":
        from fgvc_tpu.datasets.davis_vos import DavisVosDataset

        ds = DavisVosDataset(data_root, split_list=list_path)
        return eval_vos(
            tracker, ds, max_videos, rank=rank, world=world,
            output_dir=output_dir, devices=devices,
        )
    raise ValueError(f"unknown task {task}")
