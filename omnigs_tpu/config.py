"""Configuration system mirroring the reference's YAML schema.

The reference parses OpenCV `cv::FileStorage` YAML with one flat namespace
(`/root/reference/src/gaussian_mapper.cpp:76-218`; schema =
`cfg/lonlat/360roam_lonlat.yaml`). Here the same keys land in typed
dataclasses; `load_config` reads the reference's YAML files directly (the
`%YAML:1.0` header and flat `Section.key: value` lines) so existing configs
work unchanged.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Union


@dataclasses.dataclass
class ModelParams:
    """`GaussianModelParams` (`include/gaussian_parameters.h`)."""

    sh_degree: int = 3
    resolution: float = -1.0
    white_background: bool = False
    eval: bool = False


@dataclasses.dataclass
class OptimizationParams:
    """`GaussianOptimizationParams` defaults
    (`include/gaussian_parameters.h:64-102`) + the YAML Optimization.* keys."""

    max_num_iterations: int = 32010
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001

    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    prune_big_point_after_iter: int = 0
    densify_min_opacity: float = 0.005
    densify_from_iter: int = 500
    densify_until_iter: int = 15000
    densify_grad_threshold: float = 0.0002
    prune_by_extent: bool = True
    skip_bottom_ratio: float = 0.0


@dataclasses.dataclass
class PipelineParams:
    convert_SHs: bool = False
    compute_cov3D: bool = False
    z_near: float = 0.01
    z_far: float = 100.0


@dataclasses.dataclass
class GausPyramidParams:
    """Coarse-to-fine pyramid training (`src/gaussian_mapper.cpp:140-151`):
    level l trains at resolution factor 0.5^(L-l) with a per-keyframe
    times-of-use budget before graduating to full resolution."""

    do: bool = False
    num_sub_levels: int = 0
    sub_level_times_of_use: int = 8

    def factor(self, level: int) -> float:
        return 0.5 ** (self.num_sub_levels - level)


@dataclasses.dataclass
class MapperParams:
    new_keyframe_times_of_use: int = 1
    keyframe_record_interval: int = 0
    all_keyframes_record_interval: int = 8000
    record_rendered_image: bool = True
    record_ground_truth_image: bool = False
    record_loss_image: bool = False
    training_report_interval: int = 10000


@dataclasses.dataclass
class TpuParams:
    """TPU-native knobs with no reference analog (capacities & sharding)."""

    capacity: int = 1 << 19  # max Gaussians P_max
    max_instances: int = 1 << 22
    tile_cap: int = 1024
    chunk: int = 64
    backend: str = "pallas"  # "pallas" (TPU) | "xla" (any device)
    tight_culling: bool = True
    tile_culling: bool = True  # exact ellipse-box culling (pallas backend)
    aligned_cap: int = 0  # live-slab cap; 0 = uncapped (never drops tiles)
    # device-memory budget for the fused-window GT bank; scenes whose GT
    # images exceed it fall back to per-window host gather + upload
    gt_bank_mb: int = 2048
    # iterations scanned into one device program between densify/reset/
    # SH-bump events (1 = dispatch per iteration like the reference loop)
    fuse_steps: int = 24
    mesh_data: int = 1  # view-parallel axis size
    mesh_gauss: int = 1  # Gaussian-parallel axis size
    views_per_group: int = 1  # views batched per data group per step
    # n_contrib contribution ranks (diagnostic; ~10 VPU ops/pair in the
    # forward — nothing in train/eval consumes it, ADVICE r3 #2)
    want_ncontrib: bool = False
    # round-4 perf paths, DEFAULT ON (measured e2e on chip, BENCH.md r4:
    # base 21.36 → +gather_reduce 24.68 → +depth_presort 25.90 Mpix/s).
    # Both degrade safely: depth_presort falls back to the 2-key sort when
    # P > 2^19 or the tile grid overflows the packed key (rasterize.py
    # checks), gather_reduce keeps full-length survivor ranks so truncated
    # tiles simply contribute zero gradient rows (as the scatter path does).
    gather_reduce: bool = True
    depth_presort: bool = True
    # round-5 segmented-chunk kernels (ops/pallas_seg.py): walk the slab
    # linearly, one pass per 128-lane chunk straddling tile boundaries —
    # measured e2e on chip 24.5 → 27.2 Mpix/s over the tile-major kernels
    # at the bench workload (BENCH.md r5). Default ON; requires
    # want_ncontrib=False (auto-disabled otherwise). gather_reduce is
    # demoted under segmented (measured loser there — the emission payload
    # + relay tax exceeds the scatter's cost on the 8-granular slab).
    segmented: bool = True


@dataclasses.dataclass
class Config:
    model: ModelParams = dataclasses.field(default_factory=ModelParams)
    opt: OptimizationParams = dataclasses.field(default_factory=OptimizationParams)
    pipe: PipelineParams = dataclasses.field(default_factory=PipelineParams)
    mapper: MapperParams = dataclasses.field(default_factory=MapperParams)
    pyramid: GausPyramidParams = dataclasses.field(
        default_factory=GausPyramidParams
    )
    tpu: TpuParams = dataclasses.field(default_factory=TpuParams)


def _parse_opencv_yaml(path: Union[str, Path]) -> Dict[str, Union[int, float]]:
    """Parse the flat `Key.sub: value` OpenCV YAML files in cfg/."""
    out: Dict[str, Union[int, float]] = {}
    for line in Path(path).read_text().splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or line.startswith("%") or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip(), val.strip()
        if not val:
            continue
        try:
            out[key] = int(val)
        except ValueError:
            try:
                out[key] = float(val)
            except ValueError:
                out[key] = val  # type: ignore[assignment]
    return out


_KEYMAP = {
    "Model.sh_degree": ("model", "sh_degree", int),
    "Model.resolution": ("model", "resolution", float),
    "Model.white_background": ("model", "white_background", bool),
    "Model.eval": ("model", "eval", bool),
    "Camera.z_near": ("pipe", "z_near", float),
    "Camera.z_far": ("pipe", "z_far", float),
    "Pipeline.convert_SHs": ("pipe", "convert_SHs", bool),
    "Pipeline.compute_cov3D": ("pipe", "compute_cov3D", bool),
    "Mapper.new_keyframe_times_of_use": ("mapper", "new_keyframe_times_of_use", int),
    "GausPyramid.do": ("pyramid", "do", bool),
    "GausPyramid.num_sub_levels": ("pyramid", "num_sub_levels", int),
    "GausPyramid.sub_level_times_of_use": ("pyramid", "sub_level_times_of_use", int),
    "Record.keyframe_record_interval": ("mapper", "keyframe_record_interval", int),
    "Record.all_keyframes_record_interval": (
        "mapper",
        "all_keyframes_record_interval",
        int,
    ),
    "Record.record_rendered_image": ("mapper", "record_rendered_image", bool),
    "Record.record_ground_truth_image": ("mapper", "record_ground_truth_image", bool),
    "Record.record_loss_image": ("mapper", "record_loss_image", bool),
    "Record.training_report_interval": ("mapper", "training_report_interval", int),
    "Optimization.max_num_iterations": ("opt", "max_num_iterations", int),
    "Optimization.position_lr_init": ("opt", "position_lr_init", float),
    "Optimization.position_lr_final": ("opt", "position_lr_final", float),
    "Optimization.position_lr_delay_mult": ("opt", "position_lr_delay_mult", float),
    "Optimization.position_lr_max_steps": ("opt", "position_lr_max_steps", int),
    "Optimization.feature_lr": ("opt", "feature_lr", float),
    "Optimization.opacity_lr": ("opt", "opacity_lr", float),
    "Optimization.scaling_lr": ("opt", "scaling_lr", float),
    "Optimization.rotation_lr": ("opt", "rotation_lr", float),
    "Optimization.percent_dense": ("opt", "percent_dense", float),
    "Optimization.lambda_dssim": ("opt", "lambda_dssim", float),
    "Optimization.densification_interval": ("opt", "densification_interval", int),
    "Optimization.opacity_reset_interval": ("opt", "opacity_reset_interval", int),
    "Optimization.prune_big_point_after_iter": (
        "opt",
        "prune_big_point_after_iter",
        int,
    ),
    "Optimization.densify_min_opacity": ("opt", "densify_min_opacity", float),
    "Optimization.densify_from_iter": ("opt", "densify_from_iter", int),
    "Optimization.densify_until_iter": ("opt", "densify_until_iter", int),
    "Optimization.densify_grad_threshold": ("opt", "densify_grad_threshold", float),
    "Optimization.prune_by_extent": ("opt", "prune_by_extent", bool),
    "Optimization.skip_bottom_ratio": ("opt", "skip_bottom_ratio", float),
    # TPU-native extensions (absent from reference configs; defaults apply)
    "Tpu.capacity": ("tpu", "capacity", int),
    "Tpu.max_instances": ("tpu", "max_instances", int),
    "Tpu.tile_cap": ("tpu", "tile_cap", int),
    "Tpu.chunk": ("tpu", "chunk", int),
    "Tpu.tile_culling": ("tpu", "tile_culling", bool),
    "Tpu.aligned_cap": ("tpu", "aligned_cap", int),
    "Tpu.fuse_steps": ("tpu", "fuse_steps", int),
    "Tpu.gt_bank_mb": ("tpu", "gt_bank_mb", int),
    "Tpu.mesh_data": ("tpu", "mesh_data", int),
    "Tpu.mesh_gauss": ("tpu", "mesh_gauss", int),
    "Tpu.views_per_group": ("tpu", "views_per_group", int),
    "Tpu.want_ncontrib": ("tpu", "want_ncontrib", bool),
    "Tpu.gather_reduce": ("tpu", "gather_reduce", bool),
    "Tpu.depth_presort": ("tpu", "depth_presort", bool),
    "Tpu.segmented": ("tpu", "segmented", bool),
}


def raster_config_from(cfg: Config):
    """Build the production RasterConfig from Tpu.* knobs (shared by the
    trainer, the eval/test entry points, and the viewer). Falls back to the
    XLA backend off-TPU (Pallas compiled kernels are TPU-only)."""
    import jax

    from omnigs_tpu.ops.rasterize import RasterConfig

    backend = cfg.tpu.backend
    if backend == "pallas" and jax.default_backend() == "cpu":
        backend = "xla"
    # aligned_cap: 0/unset = uncapped (slab spans the full sorted array —
    # never drops anything). An explicit cap is a perf knob that trades
    # deterministic, *counted* tile drops for smaller gather/scatter stages;
    # it is rounded up to the Pallas chunk width (kernel DMA alignment).
    aligned_cap = cfg.tpu.aligned_cap or None
    if aligned_cap is not None:
        from omnigs_tpu.ops.pallas_raster import CHUNK

        aligned_cap = -(-aligned_cap // CHUNK) * CHUNK
    # Tpu.max_instances: 0 = auto-size. The measurement-driven autosizing
    # lives in Trainer._autosize_capacities (it needs a model + views);
    # every other consumer (test/eval entry points, viewers) gets a
    # generous static budget here — round-3 half-res protocol found the
    # test binary silently rendering nothing on a 0 budget.
    max_instances = cfg.tpu.max_instances or (1 << 22)
    return RasterConfig(
        max_instances=max_instances,
        tile_cap=cfg.tpu.tile_cap,
        chunk=cfg.tpu.chunk,
        backend=backend,
        tight_culling=cfg.tpu.tight_culling,
        tile_culling=backend == "pallas" and cfg.tpu.tile_culling,
        aligned_cap=aligned_cap if backend == "pallas" else None,
        # production defaults (output-equivalent, BENCH.md round 3/4):
        # n_contrib is a diagnostic nothing in train/eval consumes
        # (Tpu.want_ncontrib re-enables it for debugging, ADVICE r3 #2).
        # fused_reduce measured 6× SLOWER than the live-bound scatter on
        # chip (Mosaic rolled per-instance loops cost ~150 ns/instance) —
        # stays off; the knob + kernel remain for wider-VPU hardware.
        want_ncontrib=cfg.tpu.want_ncontrib,
        fused_reduce=False,
        gather_reduce=backend == "pallas" and cfg.tpu.gather_reduce,
        depth_presort=backend == "pallas" and cfg.tpu.depth_presort,
        segmented=(
            backend == "pallas"
            and cfg.tpu.segmented
            and not cfg.tpu.want_ncontrib
        ),
    )


def load_config(path: Union[str, Path]) -> Config:
    """Load a reference-format YAML (e.g. `cfg/lonlat/360roam_lonlat.yaml`)."""
    raw = _parse_opencv_yaml(path)
    cfg = Config()
    for key, val in raw.items():
        if key not in _KEYMAP:
            continue
        section, attr, typ = _KEYMAP[key]
        obj = getattr(cfg, section)
        setattr(obj, attr, typ(val))
    return cfg
