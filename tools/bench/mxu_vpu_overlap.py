"""Microbenchmark: does Mosaic co-schedule independent MXU and VPU work?

The fused propagation kernel currently runs pass A (per-frame affinity
matmuls, MXU) to completion before pass B (top-k stat rounds, VPU).  If the
Mosaic scheduler overlaps data-independent MXU and VPU streams inside one
kernel, interleaving frame t's matmul with frame t-1's stat rounds would
hide most of pass B behind pass A (docs/kernel_roadmap.md round-4 lever).

Three kernels at pass-A/B-like shapes (S=256 rows, FK=2304 cols, C=256):
  mxu_only  — T dependent matmul accumulations
  vpu_only  — R max+count rounds over a resident (S, T*FK) block
  mixed     — both, data-independent
overlap quality = (mxu + vpu - mixed) / min(mxu, vpu)  (1.0 = full overlap).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

S, FK, C, T, R = 256, 2304, 256, 6, 11
NEG = -1e30


def make(kind):
    def kernel(q_ref, k_ref, out_ref, aff_ref):
        q = q_ref[:]

        def mxu_pass():
            def frame(t, acc):
                a = jax.lax.dot_general(
                    q, k_ref[t],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                aff_ref[:, pl.ds(t * FK, FK)] = a
                return acc + a[:, :128]
            return jax.lax.fori_loop(0, T, frame, jnp.zeros((S, 128), jnp.float32))

        def vpu_pass():
            prev = jnp.full((S, 1), jnp.float32(1e30))
            tot = jnp.zeros((S, 1), jnp.float32)
            for _ in range(R):
                a = aff_ref[:]
                cge = jnp.sum((a >= prev).astype(jnp.float32), -1, keepdims=True)
                m = jnp.max(jnp.where(a < prev, a, NEG), -1, keepdims=True)
                prev = m
                tot = tot + cge
            return tot

        if kind == "mxu":
            out_ref[:] = mxu_pass()
        elif kind == "vpu":
            aff_ref[:, 0:FK] = q[:, 0:1] + jnp.zeros((S, FK), jnp.float32)
            out_ref[:] = vpu_pass() + jnp.zeros((S, 128), jnp.float32)
        else:  # mixed: interleave per frame — stats of the PREVIOUS frame's
            # block run between matmuls, with no data dependency on them
            def frame(t, carry):
                acc, prev, tot = carry
                a = jax.lax.dot_general(
                    q, k_ref[t],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                aff_ref[:, pl.ds(t * FK, FK)] = a
                # VPU rounds over a FIXED region (frame 0's block) — the
                # point is issue overlap, not exact semantics
                for _ in range(2):
                    blk = aff_ref[:, 0:FK]
                    cge = jnp.sum((blk >= prev).astype(jnp.float32), -1,
                                  keepdims=True)
                    m = jnp.max(jnp.where(blk < prev, blk, NEG), -1,
                                keepdims=True)
                    prev = m
                    tot = tot + cge
                return acc + a[:, :128], prev, tot

            init = (jnp.zeros((S, 128), jnp.float32),
                    jnp.full((S, 1), jnp.float32(1e30)),
                    jnp.zeros((S, 1), jnp.float32))
            acc, prev, tot = jax.lax.fori_loop(0, T, frame, init)
            out_ref[:] = acc + tot

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((S, T * FK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )


def bench(fn, *args, iters=30):
    o = fn(*args); float(jnp.sum(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    float(jnp.sum(o))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((T, FK, C)), jnp.float32)

    times = {}
    for kind in ("mxu", "vpu", "mixed"):
        f = jax.jit(lambda q, k, kind=kind: make(kind)(q, k))
        times[kind] = bench(f, q, k)
        print(f"{kind:6s}: {times[kind]:.3f} ms")
    # mixed does T*2=12 visible VPU rounds vs vpu's 11 over a T× smaller
    # block; normalize per-element: vpu does R*T*FK, mixed does T*2*FK
    vpu_frac = (T * 2) / (R * T)
    expected_serial = times["mxu"] + times["vpu"] * vpu_frac
    print(f"mixed expected if serial: {expected_serial:.3f} ms")
    overlap = (expected_serial - times["mixed"]) / (times["vpu"] * vpu_frac)
    print(f"overlap quality: {overlap:.2f} (1.0 = VPU fully hidden)")


if __name__ == "__main__":
    main()
