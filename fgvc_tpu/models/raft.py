"""RAFT optical flow — the reference's flow-based tracking baseline.

Re-design of the reference RAFT stack in flax/JAX:
  * tracker: /root/reference/mmpt/models/trackers/raft.py:26-288
  * encoders: mmpt/models/backbones/flow_encoder.py, basic_encoder.py
  * decoder:  mmpt/models/components/decoder/flow_decorder.py:17-546
    (CorrelationPyramid, MotionEncoder, ConvGRU, XHead, RAFTDecoder)
  * loss:     mmpt/models/losses/sequence_loss.py:12 (γ-weighted)
  * corr lookup: mmpt/models/common/corr_lookup.py:70 (bilinear pyramid
    sampling at flow-displaced coordinates)

All-pairs correlation, 4-level average-pooled pyramid, lookup radius 4,
separable ConvGRU iterative refinement, convex-mask 8× upsampling.  The
point-tracking path chains per-pair flows through time with bilinear
sampling and marks points out of frame as occluded (raft.py:222-288).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fgvc_tpu.ops.warp import bilinear_sample


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "instance"

    def _norm(self, name):
        if self.norm == "instance":
            # torch InstanceNorm2d(affine=False) == per-channel GroupNorm
            # whose scale/bias stay at their identity init
            return nn.GroupNorm(num_groups=None, group_size=1, name=name)
        if self.norm == "batch":
            # frozen (eval-mode) BatchNorm: running stats come from the
            # converted torch checkpoint (raft_convert.py)
            return nn.BatchNorm(use_running_average=True, name=name)
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, name="conv1")(x)
        y = nn.relu(self._norm("norm1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(self._norm("norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1),
                        strides=(self.stride,) * 2, name="down")(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT feature/context encoder: stride-8, `out_dim` channels."""

    out_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1")(x)
        if self.norm == "instance":
            x = nn.GroupNorm(num_groups=None, group_size=1, name="norm1")(x)
        elif self.norm == "batch":
            x = nn.BatchNorm(use_running_average=True, name="norm1")(x)
        x = nn.relu(x)
        for i, (feat, stride) in enumerate(((64, 1), (96, 2), (128, 2))):
            x = ResBlock(feat, stride, self.norm, name=f"layer{i}_0")(x)
            x = ResBlock(feat, 1, self.norm, name=f"layer{i}_1")(x)
        return nn.Conv(self.out_dim, (1, 1), name="conv2")(x)


def correlation_pyramid(f1: jax.Array, f2: jax.Array, levels: int = 4):
    """All-pairs correlation pyramid.

    f1, f2: (H, W, C) stride-8 features → list of (H, W, H/2^l, W/2^l)
    volumes (correlation between every f1 pixel and pooled f2 pixels).
    """
    H, W, C = f1.shape
    corr = jnp.einsum(
        "ijc,klc->ijkl", f1, f2, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(C))
    pyramid = [corr]
    cur = corr
    for _ in range(levels - 1):
        h2, w2 = cur.shape[2] // 2, cur.shape[3] // 2
        if h2 >= 1 and w2 >= 1:
            # 2x2 avg-pool with stride 2, floor semantics (F.avg_pool2d):
            # handles odd dims by dropping the trailing row/col
            cur = jax.lax.reduce_window(
                cur,
                0.0,
                jax.lax.add,
                window_dimensions=(1, 1, 2, 2),
                window_strides=(1, 1, 2, 2),
                padding="VALID",
            ) * 0.25
        # else: map already 1x1 — repeat the coarsest level so the motion
        # encoder's channel count stays levels*(2r+1)^2 at any input size
        pyramid.append(cur)
    return pyramid


def lookup_corr(pyramid, coords: jax.Array, radius: int = 4) -> jax.Array:
    """Sample each pyramid level in a (2r+1)² window around coords/2^l.

    coords: (H, W, 2) current flow targets in stride-8 pixels.
    Returns (H, W, levels*(2r+1)²) motion features.
    """
    H, W, _ = coords.shape
    r = radius
    d = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-r, r + 1, dtype=jnp.float32),
            jnp.arange(-r, r + 1, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=-1,
    )  # (2r+1, 2r+1, 2) (dy, dx)
    # reference quirk (corr_lookup.py:52): delta = stack(meshgrid(dy, dx))
    # is ADDED to (x, y), so the x offset varies along the SLOW window axis
    offsets = jnp.stack([d[..., 0], d[..., 1]], axis=-1).reshape(-1, 2)

    outs = []
    for lvl, corr in enumerate(pyramid):
        ch, cw = corr.shape[2], corr.shape[3]
        c = coords / (2.0**lvl)
        # sample corr[i, j] (a (ch, cw) map) at c[i, j] + offsets
        flat = corr.reshape(H * W, ch, cw)
        pts = c.reshape(H * W, 1, 2) + offsets[None]  # (HW, R2, 2)

        def sample_one(m, p):
            return bilinear_sample(m[..., None], p)[..., 0]

        vals = jax.vmap(sample_one)(flat, pts)  # (HW, R2)
        outs.append(vals.reshape(H, W, -1))
    return jnp.concatenate(outs, axis=-1)


def lookup_heat(
    heats: jax.Array, coords: jax.Array, radius: int = 4, interval: int = 1
) -> jax.Array:
    """Sample per-point heatmap windows — the HeatLookup operator
    (reference corr_lookup.py:211-271), used by the heat-decoder ablation
    configs.

    heats: (T, P, H, W) per-frame per-point heatmaps; coords: (T, P, 2)
    (x, y) pixel centers.  Returns (T, P, n²) with n = 2*(radius//interval)+1
    window samples (bilinear, align_corners=True normalization ∘ grid_sample
    = plain pixel-coord bilinear with zero padding — ops/warp.bilinear_sample).

    Reference quirks kept / documented:
      * delta = stack(meshgrid(dy, dx)) is ADDED to the (x, y) centroid
        (corr_lookup.py:259-263), so the x offset varies along the SLOW
        window axis — same transposed-window quirk as `lookup_corr`.
      * For interval > 1 the reference is non-executable: it builds
        2*(r//interval)+1 linspace points but views the window as
        (2r+1, 2r+1) (corr_lookup.py:264) — a shape error.  Here the view
        uses the actual window size, so interval > 1 subsamples the window
        as the linspace intends.
    """
    T, P, H, W = heats.shape
    n = 2 * (radius // interval) + 1
    d = jnp.linspace(-float(radius), float(radius), n)
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    offsets = jnp.stack([dy, dx], axis=-1).reshape(-1, 2)  # added to (x, y)
    maps = heats.reshape(T * P, H, W)
    pts = coords.reshape(T * P, 1, 2) + offsets[None]

    def sample_one(m, p):
        return bilinear_sample(m[..., None], p)[..., 0]

    vals = jax.vmap(sample_one)(maps, pts)
    return vals.reshape(T, P, n * n)


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr_feat):
        c = nn.relu(nn.Conv(256, (1, 1), name="conv_c1")(corr_feat))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, name="conv_c2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, name="conv_f1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, name="conv_f2")(f))
        out = nn.relu(
            nn.Conv(126, (3, 3), padding=1, name="conv")(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)  # 128 ch


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for name, ksize in (("h", (1, 5)), ("v", (5, 1))):
            pad = tuple((k // 2, k // 2) for k in ksize)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(
                nn.Conv(self.hidden, ksize, padding=pad, name=f"convz_{name}")(hx)
            )
            r = nn.sigmoid(
                nn.Conv(self.hidden, ksize, padding=pad, name=f"convr_{name}")(hx)
            )
            q = nn.tanh(
                nn.Conv(self.hidden, ksize, padding=pad, name=f"convq_{name}")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    @nn.compact
    def __call__(self, h):
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv1")(h))
        return nn.Conv(2, (3, 3), padding=1, name="conv2")(x)


class MaskHead(nn.Module):
    @nn.compact
    def __call__(self, h):
        x = nn.relu(nn.Conv(256, (3, 3), padding=1, name="conv1")(h))
        return nn.Conv(64 * 9, (1, 1), name="conv2")(x) * 0.25


def convex_upsample(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """8× upsampling with learned convex combination of 3×3 neighborhoods."""
    H, W, _ = flow.shape
    m = mask.reshape(H, W, 8, 8, 9)
    m = jax.nn.softmax(m, axis=-1)
    fp = jnp.pad(flow * 8.0, ((1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            fp[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        axis=-2,
    )  # (H, W, 9, 2)
    up = jnp.einsum("hwabn,hwnc->hwabc", m, neigh)
    return up.transpose(0, 2, 1, 3, 4).reshape(H * 8, W * 8, 2)


class RAFT(nn.Module):
    """RAFT flow network on a single image pair (channels-last, no batch)."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    # official RAFT uses batch-normed context encoder; "none" is our
    # from-scratch training default (no running stats to manage)
    cnet_norm: str = "none"

    @nn.compact
    def __call__(self, image1, image2):
        fnet = BasicEncoder(256, "instance", name="fnet")
        cnet = BasicEncoder(256, self.cnet_norm, name="cnet")
        f1 = fnet(image1[None])[0]
        f2 = fnet(image2[None])[0]
        ctx = cnet(image1[None])[0]
        h = jnp.tanh(ctx[..., :128])
        inp = nn.relu(ctx[..., 128:])

        pyramid = correlation_pyramid(f1, f2, self.corr_levels)
        H, W, _ = f1.shape
        gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        coords0 = jnp.stack([gx, gy], axis=-1)
        coords1 = coords0

        menc = MotionEncoder(name="motion")
        gru = SepConvGRU(name="gru")
        fhead = FlowHead(name="flow_head")
        mhead = MaskHead(name="mask_head")

        preds = []
        for _ in range(self.iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr_feat = lookup_corr(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            motion = menc(flow, corr_feat)
            h = gru(h, jnp.concatenate([inp, motion], axis=-1))
            dflow = fhead(h)
            coords1 = coords1 + dflow
            mask = mhead(h)
            preds.append(convex_upsample(coords1 - coords0, mask))
        return preds  # list of (8H, 8W, 2) flows, last is final


def sequence_loss(preds, flow_gt, valid, gamma: float = 0.8, max_flow=400.0):
    """γ-weighted L1 over the refinement sequence (sequence_loss.py:12)."""
    mag = jnp.sqrt(jnp.sum(flow_gt**2, axis=-1))
    valid = valid & (mag < max_flow)
    n = len(preds)
    total = 0.0
    for i, p in enumerate(preds):
        w = gamma ** (n - i - 1)
        l1 = jnp.abs(p - flow_gt).mean(axis=-1)
        total = total + w * jnp.sum(l1 * valid) / jnp.maximum(valid.sum(), 1)
    return total


# --------------------------------------------------------------------- #
# flow-chaining point tracker (RAFT.forward_test, raft.py:222-288)
# --------------------------------------------------------------------- #
def chain_flows_track(
    flows_fwd: np.ndarray,   # (T-1, H, W, 2) frame t -> t+1 flows
    flows_bwd: np.ndarray,   # (T-1, H, W, 2) frame t+1 -> t flows
    query_points: np.ndarray,  # (P, 3) (t, x, y)
) -> Tuple[np.ndarray, np.ndarray]:
    """Chain per-pair flows through time from each query point.

    Forward from the query frame via fwd flows; backward before the query
    frame via bwd flows.  Visibility = point inside the frame bounds.
    Returns (T, P, 2) trajectories and (T, P) visibility.
    """
    T = flows_fwd.shape[0] + 1
    H, W = flows_fwd.shape[1:3]
    P = query_points.shape[0]
    traj = np.zeros((T, P, 2), np.float32)
    vis = np.zeros((T, P), bool)

    def sample_flow(flow, pt):
        x = np.clip(pt[0], 0, W - 1)
        y = np.clip(pt[1], 0, H - 1)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = min(x0 + 1, W - 1), min(y0 + 1, H - 1)
        wx, wy = x - x0, y - y0
        return (
            flow[y0, x0] * (1 - wx) * (1 - wy)
            + flow[y0, x1] * wx * (1 - wy)
            + flow[y1, x0] * (1 - wx) * wy
            + flow[y1, x1] * wx * wy
        )

    for p in range(P):
        t0, x, y = int(query_points[p, 0]), *query_points[p, 1:]
        traj[t0, p] = (x, y)
        vis[t0, p] = True
        cur = np.array([x, y], np.float32)
        for t in range(t0, T - 1):  # forward chain
            cur = cur + sample_flow(flows_fwd[t], cur)
            traj[t + 1, p] = cur
            vis[t + 1, p] = (0 <= cur[0] <= W - 1) and (0 <= cur[1] <= H - 1)
        cur = np.array([x, y], np.float32)
        for t in range(t0, 0, -1):  # backward chain
            cur = cur + sample_flow(flows_bwd[t - 1], cur)
            traj[t - 1, p] = cur
            vis[t - 1, p] = (0 <= cur[0] <= W - 1) and (0 <= cur[1] <= H - 1)
    return traj, vis


class RaftTracker:
    """RAFT-as-a-tracker eval twin — the reference's RAFT baseline protocol
    (/root/reference/mmpt/models/trackers/raft.py:222-288): per-pair forward
    and backward flows, then temporal flow chaining from each query point
    with in-bounds visibility.

    API-compatible with Tracker.track_points so eval_tapvid / tools/test.py
    --model raft can score it on TAP-Vid benchmarks.
    """

    def __init__(
        self, variables=None, iters: int = 12, seed: int = 0,
        cnet_norm: str = "none",
    ):
        self.model = RAFT(iters=iters, cnet_norm=cnet_norm)
        if variables is None:
            dummy = jnp.zeros((32, 32, 3), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(seed), dummy, dummy)
        self.variables = variables
        self._flow_fn = jax.jit(
            lambda v, a, b: self.model.apply(v, a, b)[-1]
        )

    def _preprocess(self, video: np.ndarray) -> jax.Array:
        # RAFT's [-1, 1] RGB normalization (frames arrive uint8 RGB)
        return jnp.asarray(video, jnp.float32) / 127.5 - 1.0

    def track_points(self, video: np.ndarray, query_points: np.ndarray):
        """video (T, H, W, 3) uint8; query_points (P, 3) = (t, x, y)."""
        T, H, W = video.shape[:3]
        assert H % 8 == 0 and W % 8 == 0, "RAFT needs 8-divisible frames"
        frames = self._preprocess(video)
        fwd, bwd = [], []
        for t in range(T - 1):
            fwd.append(np.asarray(self._flow_fn(self.variables, frames[t], frames[t + 1])))
            bwd.append(np.asarray(self._flow_fn(self.variables, frames[t + 1], frames[t])))
        traj, vis = chain_flows_track(
            np.stack(fwd), np.stack(bwd), np.asarray(query_points, np.float32)
        )
        return {"trajectories": traj, "visibilities": vis}
