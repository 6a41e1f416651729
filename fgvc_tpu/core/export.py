"""TPU-native model export: StableHLO serialization via ``jax.export``.

Re-scopes the reference's vestigial ONNX export wrappers
(/root/reference/mmpt/core/export/wrappers.py:13-93 — mmediting leftovers
that no shipped config uses) as the TPU-idiomatic equivalent: the jitted
flagship forward is lowered to StableHLO once and serialized into a single
self-contained artifact (model weights embedded as constants), which a
serving process can deserialize and call with NO Python model code — the
XLA analogue of an ONNX deployment graph.

The exported program is the per-frame serving step of the label-propagation
tracker (the hot path of every eval task, reference
mmpt/models/trackers/vanilla_tracker.py:305-412):

    (uint8 RGB frame, key bank, value bank) ->
        Lab preprocessing -> ResNet-18-d1 features ->
        top-k masked attention against the bank -> propagated heatmaps.

``attention_impl='tiled'`` (the default here) lowers on every platform;
'pallas' embeds the Mosaic kernel and is TPU-only.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from fgvc_tpu.config import TestConfig


def make_flagship_step(
    cfg: TestConfig,
    variables,
    input_size: Optional[Tuple[int, int]] = None,
    value_dim: int = 8,
):
    """Build (fn, example_args) for the per-frame propagation serving step.

    ``fn(frame_uint8, keys, values)`` closes over the backbone variables
    (they become constants of the exported artifact) and returns the
    propagated (h, w, value_dim) heatmaps for one frame.
    """
    from fgvc_tpu.models.resnet import resnet18_d1
    from fgvc_tpu.models.tracker import Tracker

    model = resnet18_d1()
    tracker = Tracker(
        lambda v, x: model.apply(v, x, train=False), variables, cfg
    )
    H, W = input_size or cfg.input_size
    h, w = H // 2, W // 2  # stride-2 d1 features
    n_keys = cfg.precede_frames + 1

    def fn(frame, keys, values):
        query = tracker._extract_impl(frame[None], chunk=1)[0]
        key_valid = jnp.ones((n_keys,), bool)
        return tracker._attention_step(
            query, keys, values, key_valid, "circle"
        )

    rng = np.random.default_rng(0)
    example_args = (
        jnp.asarray(rng.integers(0, 256, (H, W, 3)), jnp.uint8),
        jnp.asarray(rng.standard_normal((n_keys, h, w, 256)), jnp.float32),
        jnp.asarray(rng.standard_normal((n_keys, h, w, value_dim)), jnp.float32),
    )
    return fn, example_args


def export_jit(
    fn,
    example_args: Sequence,
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """Lower + export a jittable ``fn`` for the given platforms.

    ``platforms=None`` exports for the current default backend.  Shapes and
    dtypes are taken from ``example_args`` (static, as everywhere in the
    framework — SURVEY §7 'static shapes').
    """
    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tuple(example_args),
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(fn), **kwargs)(*specs)


def save_exported(exported: jax_export.Exported, path: str) -> int:
    """Serialize to disk; returns the artifact size in bytes."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str) -> jax_export.Exported:
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))


def export_flagship(
    cfg: Optional[TestConfig] = None,
    variables=None,
    input_size: Optional[Tuple[int, int]] = None,
    value_dim: int = 8,
    platforms: Optional[Sequence[str]] = None,
    rng_seed: int = 0,
):
    """One-call flagship export; returns (exported, fn, example_args).

    With ``variables=None`` a randomly initialized backbone is exported
    (useful for artifact plumbing tests); pass converted checkpoint
    variables for a deployable artifact.
    """
    from fgvc_tpu.models.resnet import init_resnet_params, resnet18_d1

    cfg = cfg or dataclasses.replace(TestConfig(), attention_impl="tiled")
    size = input_size or cfg.input_size
    if variables is None:
        variables = init_resnet_params(
            resnet18_d1(), jax.random.PRNGKey(rng_seed), size
        )
    fn, example_args = make_flagship_step(
        cfg, variables, input_size=size, value_dim=value_dim
    )
    exported = export_jit(fn, example_args, platforms=platforms)
    return exported, fn, example_args
