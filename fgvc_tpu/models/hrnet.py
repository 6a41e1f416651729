"""HRNet backbone — TPU-native (flax, channels-last) re-design of the
reference ablation encoder (/root/reference/mmpt/models/backbones/hrnet.py:264).

Capability parity:
  * 4-stage config dicts (num_modules / num_branches / block / num_blocks /
    num_channels per stage) with BASIC and BOTTLENECK blocks,
  * stem strides override (reference `strides=(2, 2)`; `(1, 1)` keeps
    full resolution for fine-grained features — hrnet.py:404-419),
  * transitions between stages, multi-branch HRModules with full
    up/downsample fusion (bilinear align_corners=False upsample,
    strided-conv downsample chains — hrnet.py:176-230),
  * `exclude_last` early exits (skip stage3/stage4 — hrnet.py:667-682),
  * `out_indices` branch selection, single tensor when one index.

Layout: NHWC; BatchNorm uses running averages in eval (`train=False`).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, name=name)


def _conv(features: int, k: int, stride: int, name: str):
    return nn.Conv(
        features, (k, k), strides=(stride, stride),
        padding=k // 2, use_bias=False, name=name,
    )


class BasicBlockH(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(self.planes, 3, self.stride, "conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        y = _conv(self.planes, 3, 1, "conv2")(y)
        y = _bn(train, "bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _conv(self.planes, 1, self.stride, "down_conv")(x)
            x = _bn(train, "down_bn")(x)
        return nn.relu(x + y)


class BottleneckH(nn.Module):
    planes: int       # bottleneck width; output channels = 4 * planes
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * self.expansion
        y = _conv(self.planes, 1, 1, "conv1")(x)
        y = nn.relu(_bn(train, "bn1")(y))
        y = _conv(self.planes, 3, self.stride, "conv2")(y)
        y = nn.relu(_bn(train, "bn2")(y))
        y = _conv(out_ch, 1, 1, "conv3")(y)
        y = _bn(train, "bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = _conv(out_ch, 1, self.stride, "down_conv")(x)
            x = _bn(train, "down_bn")(x)
        return nn.relu(x + y)


_BLOCKS = {"BASIC": (BasicBlockH, 1), "BOTTLENECK": (BottleneckH, 4)}


class HRModule(nn.Module):
    """Parallel branches + cross-resolution fusion (hrnet.py:61-260)."""

    num_branches: int
    block: str
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]   # post-expansion channels per branch
    multiscale_output: bool = True

    @nn.compact
    def __call__(self, xs, train: bool = False):
        cls, _ = _BLOCKS[self.block]
        width = lambda c: c // _BLOCKS[self.block][1]

        ys = []
        for i in range(self.num_branches):
            y = xs[i]
            for b in range(self.num_blocks[i]):
                y = cls(
                    width(self.num_channels[i]), name=f"branch{i}_block{b}"
                )(y, train)
            ys.append(y)

        if self.num_branches == 1:
            return ys

        n_out = self.num_branches if self.multiscale_output else 1
        outs = []
        for i in range(n_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    v = ys[j]
                elif j > i:
                    # 1x1 conv + BN then bilinear x2^(j-i) upsample
                    v = _conv(self.num_channels[i], 1, 1, f"fuse{i}_{j}_conv")(
                        ys[j]
                    )
                    v = _bn(train, f"fuse{i}_{j}_bn")(v)
                    N, H, W, C = v.shape
                    s = 2 ** (j - i)
                    v = jax.image.resize(
                        v, (N, H * s, W * s, C), method="bilinear"
                    )
                else:
                    # chain of stride-2 3x3 convs; last one changes channels
                    v = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.num_channels[i] if last else self.num_channels[j]
                        v = _conv(ch, 3, 2, f"fuse{i}_{j}_down{k}_conv")(v)
                        v = _bn(train, f"fuse{i}_{j}_down{k}_bn")(v)
                        if not last:
                            v = nn.relu(v)
                acc = v if acc is None else acc + v
            outs.append(nn.relu(acc))
        return outs


# the standard HRNet-W18-small-v2-ish config, reference `extra` format
HRNET_W18_EXTRA: Dict[str, Any] = {
    "stage1": dict(num_modules=1, num_branches=1, block="BOTTLENECK",
                   num_blocks=(2,), num_channels=(64,)),
    "stage2": dict(num_modules=1, num_branches=2, block="BASIC",
                   num_blocks=(2, 2), num_channels=(18, 36)),
    "stage3": dict(num_modules=1, num_branches=3, block="BASIC",
                   num_blocks=(2, 2, 2), num_channels=(18, 36, 72)),
    "stage4": dict(num_modules=1, num_branches=4, block="BASIC",
                   num_blocks=(2, 2, 2, 2), num_channels=(18, 36, 72, 144)),
}


class HRNet(nn.Module):
    """Config-compatible HRNet (reference hrnet.py:264-707)."""

    extra: Any = None
    strides: Tuple[int, int] = (2, 2)
    out_indices: Tuple[int, ...] = (-1,)
    exclude_last: Tuple[bool, bool] = (False, False)
    multiscale_output: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = self.extra or HRNET_W18_EXTRA

        # stem: two 3x3 convs (strides configurable)
        x = _conv(64, 3, self.strides[0], "conv1")(x)
        x = nn.relu(_bn(train, "bn1")(x))
        x = _conv(64, 3, self.strides[1], "conv2")(x)
        x = nn.relu(_bn(train, "bn2")(x))

        # stage 1: single high-res branch of bottlenecks
        s1 = extra["stage1"]
        cls, exp = _BLOCKS[s1["block"]]
        for b in range(s1["num_blocks"][0]):
            x = cls(s1["num_channels"][0], name=f"layer1_{b}")(x, train)
        chans = [s1["num_channels"][0] * exp]

        ys = [x]
        for si in (2, 3, 4):
            if si == 3 and self.exclude_last[0]:
                break
            if si == 4 and self.exclude_last[1]:
                break
            cfg = extra[f"stage{si}"]
            _, exp = _BLOCKS[cfg["block"]]
            cur = [c * exp for c in cfg["num_channels"]]
            # transition from previous branch set
            xs = []
            for i in range(cfg["num_branches"]):
                if i < len(chans):
                    if chans[i] != cur[i]:
                        v = _conv(cur[i], 3, 1, f"transition{si - 1}_{i}_conv")(
                            ys[i]
                        )
                        v = nn.relu(_bn(train, f"transition{si - 1}_{i}_bn")(v))
                    else:
                        v = ys[i]
                else:
                    # new lower-res branch: stride-2 chains from the LAST
                    # previous branch (hrnet.py:508-525)
                    v = ys[-1]
                    for j in range(i + 1 - len(chans)):
                        last = j == i - len(chans)
                        ch = cur[i] if last else chans[-1]
                        v = _conv(ch, 3, 2, f"transition{si - 1}_{i}_d{j}_conv")(v)
                        v = nn.relu(
                            _bn(train, f"transition{si - 1}_{i}_d{j}_bn")(v)
                        )
                xs.append(v)
            # HR modules
            ms_out = True
            for m in range(cfg["num_modules"]):
                if (
                    si == 4
                    and m == cfg["num_modules"] - 1
                    and not self.multiscale_output
                ):
                    ms_out = False
                xs = HRModule(
                    cfg["num_branches"],
                    cfg["block"],
                    tuple(cfg["num_blocks"]),
                    tuple(cur),
                    multiscale_output=ms_out,
                    name=f"stage{si}_m{m}",
                )(xs, train)
            ys = xs
            chans = cur[: len(ys)]

        outs = [ys[i] for i in self.out_indices]
        return outs[0] if len(outs) == 1 else tuple(outs)


def hrnet_w18(**kw) -> HRNet:
    return HRNet(extra=HRNET_W18_EXTRA, **kw)


def init_hrnet_params(model: HRNet, rng, input_hw: Tuple[int, int]):
    dummy = jnp.zeros((1, *input_hw, 3), jnp.float32)
    return model.init(rng, dummy, train=False)


def convert_hrnet_state_dict(state, extra=None, prefix: str = ""):
    """mmcv HRNet checkpoint → flax HRNet variables.

    Maps the mmcv module naming (hrnet.py:264-470) onto this module's
    structure:

      conv1/bn1/conv2/bn2                      → stem
      layer1.{j}.conv{n}/bn{n}[,downsample.0/1] → layer1_{j} bottlenecks
      transition{s}.{i}(.{k}).0/.1             → transition{s}_{i}[_d{k}]
      stage{s}.{m}.branches.{b}.{j}.*          → stage{s}_m{m}/branch{b}_block{j}
      stage{s}.{m}.fuse_layers.{i}.{j}...      → stage{s}_m{m}/fuse{i}_{j}*

    Raises on unconverted `{prefix}`-scoped keys (same no-silent-partial-load
    policy as the ResNet/RAFT/DINO converters).
    """
    import numpy as np

    extra = extra or HRNET_W18_EXTRA
    p = prefix
    state = {k: np.asarray(v) for k, v in state.items()}
    params, stats = {}, {}
    consumed = set()

    def put(tree, path, leaf):
        node = tree
        for q in path[:-1]:
            node = node.setdefault(q, {})
        node[path[-1]] = leaf

    def conv(fpath, tkey):
        k = f"{tkey}.weight"
        if k not in state:
            return False
        put(params, (*fpath, "kernel"), np.transpose(state[k], (2, 3, 1, 0)))
        consumed.add(k)
        return True

    def bn(fpath, tbase):
        k = f"{tbase}.weight"
        if k not in state:
            return False
        put(params, (*fpath, "scale"), state[k])
        put(params, (*fpath, "bias"), state[f"{tbase}.bias"])
        put(stats, (*fpath, "mean"), state[f"{tbase}.running_mean"])
        put(stats, (*fpath, "var"), state[f"{tbase}.running_var"])
        consumed.update(
            f"{tbase}.{s}"
            for s in ("weight", "bias", "running_mean", "running_var")
        )
        return True

    # stem
    conv(("conv1",), f"{p}conv1")
    bn(("bn1",), f"{p}bn1")
    conv(("conv2",), f"{p}conv2")
    bn(("bn2",), f"{p}bn2")

    def block(fblock, tbase, kind):
        convs = (1, 2, 3) if kind == "BOTTLENECK" else (1, 2)
        for n in convs:
            conv((*fblock, f"conv{n}"), f"{tbase}.conv{n}")
            bn((*fblock, f"bn{n}"), f"{tbase}.bn{n}")
        if conv((*fblock, "down_conv"), f"{tbase}.downsample.0"):
            bn((*fblock, "down_bn"), f"{tbase}.downsample.1")

    # stage 1 (layer1)
    s1 = extra["stage1"]
    for j in range(s1["num_blocks"][0]):
        block((f"layer1_{j}",), f"{p}layer1.{j}", s1["block"])

    for si in (2, 3, 4):
        cfg = extra[f"stage{si}"]
        nb = cfg["num_branches"]
        # transitions: mmcv transition{si-1}.{i} is either Sequential(conv,
        # bn, relu) (same-branch channel change) or Sequential of
        # Sequential(conv, bn, relu) downsample chains (new branches)
        for i in range(nb):
            t = f"{p}transition{si - 1}.{i}"
            if conv((f"transition{si - 1}_{i}_conv",), f"{t}.0"):
                bn((f"transition{si - 1}_{i}_bn",), f"{t}.1")
            else:
                k = 0
                while conv(
                    (f"transition{si - 1}_{i}_d{k}_conv",), f"{t}.{k}.0"
                ):
                    bn((f"transition{si - 1}_{i}_d{k}_bn",), f"{t}.{k}.1")
                    k += 1
        # HR modules
        for m in range(cfg["num_modules"]):
            base = f"{p}stage{si}.{m}"
            fmod = f"stage{si}_m{m}"
            for b in range(nb):
                for j in range(cfg["num_blocks"][b]):
                    block(
                        (fmod, f"branch{b}_block{j}"),
                        f"{base}.branches.{b}.{j}",
                        cfg["block"],
                    )
            for i in range(nb):
                for j in range(nb):
                    if j == i:
                        continue
                    fl = f"{base}.fuse_layers.{i}.{j}"
                    if j > i:
                        if conv((fmod, f"fuse{i}_{j}_conv"), f"{fl}.0"):
                            bn((fmod, f"fuse{i}_{j}_bn"), f"{fl}.1")
                    else:
                        for k in range(i - j):
                            if conv(
                                (fmod, f"fuse{i}_{j}_down{k}_conv"),
                                f"{fl}.{k}.0",
                            ):
                                bn(
                                    (fmod, f"fuse{i}_{j}_down{k}_bn"),
                                    f"{fl}.{k}.1",
                                )

    scope = (
        lambda k: k.startswith(p)
        if p
        else not k.startswith(("head", "classifier", "fc", "incre", "downsamp", "final"))
    )
    leftover = {
        k
        for k in state
        if scope(k)
        and k not in consumed
        and not k.endswith("num_batches_tracked")
    }
    if leftover:
        raise ValueError(
            f"unconverted HRNet keys: {sorted(leftover)[:8]}"
            f"{' ...' if len(leftover) > 8 else ''}"
        )

    import jax.numpy as jnp_

    to = lambda t: jax.tree_util.tree_map(jnp_.asarray, t)
    return {"params": to(params), "batch_stats": to(stats)}
