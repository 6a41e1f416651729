"""StableHLO export round-trip tests (fgvc_tpu/core/export.py).

The TPU-native re-scope of the reference's ONNX export wrappers
(/root/reference/mmpt/core/export/wrappers.py:13-93): serialize the jitted
flagship serving step, deserialize it, and check the restored artifact
reproduces direct execution bit-for-bit on the same platform.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from fgvc_tpu.config import TestConfig


def _tiny_cfg():
    return dataclasses.replace(
        TestConfig(),
        attention_impl="tiled",
        input_size=(32, 32),
        neighbor_range=6,
        tile=8,
        topk=4,
        precede_frames=2,
    )


def test_flagship_export_roundtrip(tmp_path):
    from fgvc_tpu.core.export import (
        export_flagship,
        load_exported,
        save_exported,
    )

    exported, fn, example_args = export_flagship(_tiny_cfg(), value_dim=3)
    path = os.path.join(tmp_path, "step.jaxexp")
    nbytes = save_exported(exported, path)
    assert nbytes > 0 and os.path.getsize(path) == nbytes

    restored = load_exported(path)
    got = np.asarray(restored.call(*example_args))
    want = np.asarray(jax.jit(fn)(*example_args))
    h, w = 16, 16
    assert got.shape == (h, w, 3)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # weights are embedded: the artifact takes only (frame, keys, values)
    assert len(restored.in_avals) == 3


def test_export_generic_fn_roundtrip(tmp_path):
    """export_jit works for arbitrary jittable functions, not just the
    flagship step."""
    from fgvc_tpu.core.export import export_jit, load_exported, save_exported

    def fn(a, b):
        return jnp.tanh(a) @ b + 1.0

    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.standard_normal((4, 8)), jnp.float32),
        jnp.asarray(rng.standard_normal((8, 2)), jnp.float32),
    )
    exported = export_jit(fn, args)
    path = os.path.join(tmp_path, "fn.jaxexp")
    save_exported(exported, path)
    restored = load_exported(path)
    np.testing.assert_allclose(
        np.asarray(restored.call(*args)), np.asarray(fn(*args)), atol=1e-6
    )


def test_export_cli(tmp_path):
    """tools/export.py end-to-end with --check on tiny shapes."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.export import main

    out = os.path.join(tmp_path, "cli.jaxexp")
    main(
        [
            "--out",
            out,
            "--input-size",
            "32",
            "32",
            "--value-dim",
            "2",
            "--check",
        ]
    )
    assert os.path.getsize(out) > 0
