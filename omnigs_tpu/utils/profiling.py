"""Profiling + memory accounting — the reference's observability surface
(`std::chrono` spans + c10 allocator stats, SURVEY.md §5) made TPU-native.

* `step_timer` — sync-bracketed wall-clock spans (the analog of the
  reference's per-iteration timing, `src/gaussian_mapper.cpp:298,454-456`).
* `device_peak_memory_mb` — `GpuPeakUsageMB.txt` analog
  (`examples/train_360roam.cpp:36-51`) from PJRT memory stats.
* `trace` — context manager around `jax.profiler` for xprof traces.
* `roofline_report` — pixels/s against the HBM/MXU bounds of the chip, for
  the BASELINE "within 1.2× roofline" target.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def step_timer(results: Dict[str, float], key: str):
    """Device-sync-bracketed timing: `with step_timer(d, "render"): ...`."""
    t0 = time.perf_counter()
    yield
    results[key] = (time.perf_counter() - t0) * 1000.0


def device_peak_memory_mb(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Peak/current device memory in MB (GpuPeakUsageMB analog)."""
    d = device or jax.devices()[0]
    stats = d.memory_stats() or {}
    scale = 1.0 / (1024 * 1024)
    out = {}
    for k_in, k_out in [
        ("peak_bytes_in_use", "peak_mb"),
        ("bytes_in_use", "current_mb"),
        ("bytes_limit", "limit_mb"),
    ]:
        if k_in in stats:
            out[k_out] = stats[k_in] * scale
    return out


def write_peak_memory(result_dir: Path):
    """`saveGpuPeakMemoryUsage` analog → DevicePeakUsageMB.txt."""
    stats = device_peak_memory_mb()
    lines = [f"{k} {v:.1f}" for k, v in stats.items()]
    (Path(result_dir) / "DevicePeakUsageMB.txt").write_text("\n".join(lines) + "\n")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/omnigs_trace"):
    """Capture an xprof trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


# v5e-class chip characteristics (per-chip, order-of-magnitude roofline)
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0
V5E_F32_TFLOPS = 49.0


def roofline_report(
    pixels: int,
    seconds: float,
    mean_instances_per_tile: float,
    chunk: int = 128,
) -> Dict[str, float]:
    """Compare measured pixels/s against a compositing-cost roofline.

    Per pixel the compositor does ~mean_depth α-evaluations (≈12 VPU flops)
    plus the triangular-cumsum and color matmuls (≈4·chunk MXU flops per
    instance at HIGHEST precision ≈ 3 passes).
    """
    depth = mean_instances_per_tile
    vpu_flops_per_px = 12.0 * depth
    mxu_flops_per_px = 4.0 * chunk * depth / chunk * 3  # tri-cumsum at 3-pass f32
    est_mxu_bound = V5E_F32_TFLOPS * 1e12 / max(mxu_flops_per_px, 1)
    est_vpu_bound = (V5E_BF16_TFLOPS / 2) * 1e12 / max(vpu_flops_per_px, 1)
    achieved = pixels / seconds
    bound = min(est_mxu_bound, est_vpu_bound)
    return {
        "achieved_px_s": achieved,
        "roofline_px_s": bound,
        "fraction_of_roofline": achieved / bound,
    }
