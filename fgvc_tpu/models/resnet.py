"""ResNet feature encoder (flax linen, NHWC) with the reference's quirks.

Re-designed from mmpt's mmcv-style ResNet
(/root/reference/mmpt/models/backbones/resnet.py:328):

  * per-stage ``strides`` override — the shipped configs use (1, 1, 1, 4) so
    layer1–3 keep the post-stem resolution and layer3 features are stride-2
    overall,
  * ``pool_type='none'`` drops the stem max-pool (→ stride-2 features),
  * ``out_indices`` selects which stage outputs to return,
  * ``frozen_stages`` / norm-eval handled functionally: freezing is an optax
    mask + use_running_average, not module surgery,
  * dilations, 'pytorch' style (stride on the 3×3 conv of the block).

BatchNorm supports cross-replica stat sync via ``axis_name`` (the SyncBN
equivalent, /root/reference/tools/train.py:135).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _conv(features, kernel, stride=1, dilation=1, name=None, dtype=jnp.float32):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        name=name,
        dtype=dtype,
    )


def _bn(name, axis_name=None, dtype=jnp.float32):
    # dtype is the COMPUTE dtype only: flax computes batch statistics in
    # float32 regardless (normalization._compute_stats upcasts), and the
    # running stats / scale / bias stay param_dtype float32 — the standard
    # TPU mixed-precision BN (bf16 activations, f32 statistics/master state)
    return nn.BatchNorm(
        momentum=0.9,  # torch momentum 0.1 == flax momentum 0.9
        epsilon=1e-5,
        name=name,
        axis_name=axis_name,
        dtype=dtype,
    )


def temporal_shift(x: jax.Array, num_segments: int, shift_div: int = 8):
    """TSM temporal channel shift (resnet_tsm.py:68-115): within each clip of
    `num_segments` frames, the first C/div channels shift one frame forward,
    the next C/div shift one frame back, the rest stay."""
    n, h, w, c = x.shape
    x = x.reshape(-1, num_segments, h, w, c)
    fold = c // shift_div
    left = jnp.concatenate(
        [x[:, 1:, ..., :fold], jnp.zeros_like(x[:, :1, ..., :fold])], axis=1
    )
    mid = jnp.concatenate(
        [jnp.zeros_like(x[:, :1, ..., fold : 2 * fold]),
         x[:, :-1, ..., fold : 2 * fold]],
        axis=1,
    )
    out = jnp.concatenate([left, mid, x[..., 2 * fold :]], axis=-1)
    return out.reshape(n, h, w, c)


def _se_layer(x, ratio: int, name: str):
    """Squeeze-excitation (seresnet.py SELayer): global-avg → 2-layer MLP →
    sigmoid channel gates."""
    c = x.shape[-1]
    s = jnp.mean(x, axis=(1, 2))  # (N, C)
    s = nn.relu(nn.Dense(max(c // ratio, 1), name=f"{name}_fc1")(s))
    s = nn.sigmoid(nn.Dense(c, name=f"{name}_fc2")(s))
    return x * s[:, None, None, :]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    se_ratio: Optional[int] = None       # SEResNet (seresnet.py:8-56)
    tsm_segments: Optional[int] = None   # ResNetTSM (resnet_tsm.py:40-119)
    tsm_shift_div: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # TSM shifts only the residual-branch input; shortcut/downsample see
        # the original activations (TemporalShift wraps conv1 only)
        h = (
            temporal_shift(x, self.tsm_segments, self.tsm_shift_div)
            if self.tsm_segments is not None
            else x
        )
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv1", dtype=self.dtype)(h)
        out = _bn("bn1", self.axis_name, dtype=self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, name="conv2", dtype=self.dtype)(out)
        out = _bn("bn2", self.axis_name, dtype=self.dtype)(out, use_running_average=not train)
        if self.se_ratio is not None:
            out = _se_layer(out, self.se_ratio, "se")
        if self.has_downsample:
            identity = _conv(self.planes, 1, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            identity = _bn("downsample_bn", self.axis_name, dtype=self.dtype)(
                identity, use_running_average=not train
            )
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    expansion: int = 4
    se_ratio: Optional[int] = None
    tsm_segments: Optional[int] = None
    tsm_shift_div: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = (
            temporal_shift(x, self.tsm_segments, self.tsm_shift_div)
            if self.tsm_segments is not None
            else x
        )
        out = _conv(self.planes, 1, 1, name="conv1", dtype=self.dtype)(h)
        out = _bn("bn1", self.axis_name, dtype=self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        # 'pytorch' style: stride on the 3x3 conv.
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2", dtype=self.dtype)(out)
        out = _bn("bn2", self.axis_name, dtype=self.dtype)(out, use_running_average=not train)
        out = nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, name="conv3", dtype=self.dtype)(out)
        out = _bn("bn3", self.axis_name, dtype=self.dtype)(out, use_running_average=not train)
        if self.se_ratio is not None:
            out = _se_layer(out, self.se_ratio, "se")
        if self.has_downsample:
            identity = _conv(
                self.planes * self.expansion, 1, self.stride,
                name="downsample_conv", dtype=self.dtype,
            )(x)
            identity = _bn("downsample_bn", self.axis_name, dtype=self.dtype)(
                identity, use_running_average=not train
            )
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet backbone.

    Attributes mirror the reference constructor where meaningful; returns the
    single selected stage output when ``out_indices`` has one entry, else a
    tuple (same convention as the reference).
    """

    depth: int = 18
    in_channels: int = 3
    num_stages: int = 4
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    out_indices: Sequence[int] = (3,)
    pool_type: str = "max"
    axis_name: Optional[str] = None
    # Compute dtype (mixed precision): parameters and BN statistics stay
    # float32 (param_dtype); jnp.bfloat16 halves activation HBM traffic —
    # the TPU equivalent of the reference's Fp16OptimizerHook AMP mode
    # (/root/reference/mmpt/core/optimizer/opz_hook.py:74).
    dtype: Any = jnp.float32
    se_ratio: Optional[int] = None       # SEResNet variant
    tsm_segments: Optional[int] = None   # ResNetTSM variant
    tsm_shift_div: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        expansion = 1 if block_kind == "basic" else 4

        x = _conv(64, 7, 2, name="conv1", dtype=self.dtype)(x)
        x = _bn("bn1", self.axis_name, dtype=self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        if self.pool_type == "max":
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        elif self.pool_type == "mean":
            x = nn.avg_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                count_include_pad=True,
            )
        # pool_type 'none': no stem pooling (the d1 configs).

        outs = []
        inplanes = 64
        for i, num_blocks in enumerate(stage_blocks[: self.num_stages]):
            planes = 64 * 2**i
            for j in range(num_blocks):
                stride = self.strides[i] if j == 0 else 1
                has_ds = stride != 1 or inplanes != planes * expansion
                cls = BasicBlock if block_kind == "basic" else Bottleneck
                x = cls(
                    planes=planes,
                    stride=stride,
                    dilation=self.dilations[i],
                    has_downsample=has_ds,
                    axis_name=self.axis_name,
                    dtype=self.dtype,
                    se_ratio=self.se_ratio,
                    tsm_segments=self.tsm_segments,
                    tsm_shift_div=self.tsm_shift_div,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
                inplanes = planes * expansion
            if i in self.out_indices:
                outs.append(x)

        if len(outs) == 1:
            return outs[0]
        return tuple(outs)


def resnet18_d1(
    axis_name: Optional[str] = None, dtype: Any = jnp.float32
) -> ResNet:
    """The configuration used by every shipped FGVC recipe: stride-2 features.

    ResNet(depth=18, strides=(1,1,1,4), out_indices=(2,), pool_type='none')
    (/root/reference/configs/eval/res18_d1_eval.py:8).  `dtype` is the
    compute dtype (params/BN stats stay f32); see ResNet.dtype.
    """
    return ResNet(
        depth=18,
        strides=(1, 1, 1, 4),
        out_indices=(2,),
        pool_type="none",
        axis_name=axis_name,
        dtype=dtype,
    )


def init_resnet_params(
    model: ResNet, rng: jax.Array, input_hw: Tuple[int, int] = (256, 256)
) -> Any:
    """Initialize {params, batch_stats} variables for a ResNet."""
    dummy = jnp.zeros((1, *input_hw, model.in_channels), jnp.float32)
    return model.init(rng, dummy, train=False)
