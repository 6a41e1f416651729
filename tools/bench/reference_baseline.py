"""Measured anchor for the reference-throughput baseline.

BASELINE.md's 20 fps/A100 figure was a pure FLOP model (the reference
publishes no throughput).  This tool EXECUTES the reference's own
masked_attention_efficient (torch, CPU — loaded from /root/reference the
same way the golden tests do) at the exact DAVIS eval shapes and derives
the A100 estimate from the measurement:

  1. time the reference kernel per propagated frame on this host's CPU,
  2. time a bare torch f32 matmul of the kernel's dominant einsum shape on
     the same CPU → this host's achieved f32 GEMM throughput,
  3. scale: t_A100 = t_cpu × (cpu_gemm_tflops / a100_eff_tflops), with the
     A100 effective f32 GEMM figure (≈15 TFLOP/s of its 19.5 peak,
     cuBLAS-typical) — i.e. assume the kernel's non-GEMM fraction scales
     with GEMM throughput, which FAVORS the reference (its top-k/gather/
     mask steps scale worse than GEMM on GPUs).

Prints a JSON record for BASELINE.md.
"""

import importlib.util
import json
import sys
import time
import types

import numpy as np
import torch

REF = "/root/reference/mmpt/models/common"
A100_EFF_TFLOPS = 15.0  # effective f32 GEMM (cuBLAS large-shape typical)


def _load_ref(name):
    for mod in ("mmpt", "mmpt.models", "mmpt.models.common"):
        sys.modules.setdefault(mod, types.ModuleType(mod))
    sys.modules["mmpt.models.common"].part_unfold = types.ModuleType(
        "part_unfold"
    )
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"{REF}/{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    torch.manual_seed(0)
    la = _load_ref("local_attention")
    au = _load_ref("affinity_utils")

    # DAVIS eval shapes: 256² input, stride-2 features, window = first +
    # 5 preceding frames, topk 10, temp 0.07, radius 15, step 512
    # (configs/eval/res18_d1_eval.py:12)
    h = w = 128
    C, Twin, P = 256, 6, 128  # value channels = query-point heatmaps
    query = torch.randn(1, C, h, w)
    key = torch.randn(1, C, Twin, h, w)
    value = torch.rand(1, P, Twin, h, w)
    mask = au.spatial_neighbor(
        1, h, w, neighbor_range=30, device="cpu", dtype=torch.float32,
        mode="circle",
    )

    def run():
        with torch.no_grad():
            return la.masked_attention_efficient(
                query, key, value, mask,
                temperature=0.07, topk=10, step=512, non_mask_len=0,
                mode="softmax",
            )

    run()  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    t_cpu = float(np.median(times))

    # the kernel's dominant GEMM: per 512-query chunk,
    # einsum('bci,bcj->bij') (C=256) against all Twin·h·w keys
    a = torch.randn(C, 512)
    b = torch.randn(C, Twin * h * w)
    for _ in range(2):
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            _ = a.t() @ b
        t_gemm = (time.perf_counter() - t0) / reps
    gemm_flops = 2 * 512 * C * Twin * h * w
    cpu_tflops = gemm_flops / t_gemm / 1e12

    kernel_flops = 2 * (h * w) * C * (Twin * h * w)  # affinity GEMM total
    t_a100 = t_cpu * (cpu_tflops / A100_EFF_TFLOPS)
    record = {
        "t_cpu_per_frame_s": round(t_cpu, 3),
        "cpu_achieved_gemm_tflops": round(cpu_tflops, 3),
        "a100_eff_tflops_assumed": A100_EFF_TFLOPS,
        "derived_t_a100_per_frame_ms": round(t_a100 * 1e3, 2),
        "derived_a100_fps": round(1.0 / t_a100, 1),
        "flop_model_affinity_gflop_per_frame": round(kernel_flops / 1e9, 1),
        "flop_model_cross_check_fps": round(
            1.0 / (kernel_flops / (A100_EFF_TFLOPS * 1e12) / 0.5), 1
        ),
    }
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
