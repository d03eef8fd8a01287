"""Evaluation + recording harness — `renderAndRecordAllKeyframes` analog.

Reproduces the reference's metric machinery (`/root/reference/src/
gaussian_mapper.cpp:734-857`): per-keyframe forward render (device-sync
wall-clock timed), SSIM / PSNR / PSNR-GS vs the (masked, skip-bottom-cropped)
ground truth, image dumps, and the four metric text files
(`render_time.txt`, `dssim.txt`, `psnr.txt`, `psnr_gaussian_splatting.txt`)
in the same one-line-per-keyframe format.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.model.gaussians import GaussianModel
from omnigs_tpu.ops import loss as loss_ops
from omnigs_tpu.ops.rasterize import RasterConfig
from omnigs_tpu.scene.scene import Scene
from omnigs_tpu.train.renderer import render_model


import functools


@functools.lru_cache(maxsize=16)
def _eval_render_jit(camera, sh_degree, raster_cfg):
    """Jitted forward render, cached per (camera, sh_degree, config)."""

    @jax.jit
    def fn(model, vm, campos, bg):
        return render_model(
            model, camera, vm, campos, bg, sh_degree, raster_cfg
        )

    return fn


def save_image(path: Path, img: np.ndarray):
    """Save a (3, H, W) channels-first float image as PNG."""
    from PIL import Image

    arr = np.asarray(img)
    if arr.ndim == 3 and arr.shape[0] == 3:
        arr = arr.transpose(1, 2, 0)
    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def render_and_record_keyframe(
    model: GaussianModel,
    kf,
    sh_degree: int,
    raster_cfg: RasterConfig,
    bg: jnp.ndarray,
    skip_bottom_ratio: float = 0.0,
    mask: Optional[np.ndarray] = None,
):
    """One keyframe: timed render + metrics (`gaussian_mapper.cpp:734-806`).

    ``mask`` is the camera's undistort mask; like the reference it multiplies
    the RENDERED image only (`gaussian_mapper.cpp:786`) — the ground truth
    was undistorted at load. Returns (result, masked image, metrics).
    """
    vm = jnp.asarray(kf.viewmatrix)
    campos = jnp.asarray(kf.campos)
    fn = _eval_render_jit(kf.camera, sh_degree, raster_cfg)
    # warm-up call absorbs compilation (the reference's CUDA kernels are
    # AOT-compiled, so its sync-bracketed timing never sees a compile;
    # an eager or first-call timing here would be meaningless)
    res = fn(model, vm, campos, bg)
    res.image.block_until_ready()
    t0 = time.monotonic()
    res = fn(model, vm, campos, bg)
    res.image.block_until_ready()
    render_time_ms = (time.monotonic() - t0) * 1000.0

    image = res.image  # (3, H, W)
    if mask is not None:
        image = image * jnp.asarray(mask)
    gt = (
        jnp.asarray(kf.image).transpose(2, 0, 1)
        if kf.image is not None
        else None
    )
    metrics: Dict[str, float] = {"render_time_ms": render_time_ms}
    if gt is not None:
        if skip_bottom_ratio > 0.0:
            skip = int(round(kf.camera.height * skip_bottom_ratio))
            image_c, gt_c = image[:, :-skip], gt[:, :-skip]
        else:
            image_c, gt_c = image, gt
        metrics["ssim"] = float(loss_ops.ssim(image_c, gt_c))
        metrics["psnr"] = float(loss_ops.psnr(image_c, gt_c))
        metrics["psnr_gs"] = float(
            loss_ops.psnr_gaussian_splatting(image_c, gt_c)
        )
    return res, image, metrics


def render_and_record_all_keyframes(
    model: GaussianModel,
    scene: Scene,
    sh_degree: int,
    raster_cfg: RasterConfig,
    bg: jnp.ndarray,
    result_dir: Optional[Path] = None,
    name_suffix: str = "",
    skip_bottom_ratio: float = 0.0,
    record_rendered_image: bool = True,
    record_ground_truth_image: bool = False,
    record_loss_image: bool = False,
) -> Dict[str, float]:
    """All keyframes; writes the reference's metric files
    (`gaussian_mapper.cpp:808-857`). The three record flags write the
    rendered / ground-truth / |rendered − gt| images per keyframe like
    `recordKeyframeRendered` (`gaussian_mapper.cpp:424,805,975-984`).
    Returns mean metrics."""
    rows = []
    if result_dir is not None:
        result_dir = Path(result_dir)
        image_dir = result_dir / f"image{name_suffix}"
        gt_dir = result_dir / f"image_gt{name_suffix}"
        loss_dir = result_dir / f"image_loss{name_suffix}"
        if record_rendered_image:
            image_dir.mkdir(parents=True, exist_ok=True)
        if record_ground_truth_image:
            gt_dir.mkdir(parents=True, exist_ok=True)
        if record_loss_image:
            loss_dir.mkdir(parents=True, exist_ok=True)

    for fid in sorted(scene.keyframes):
        kf = scene.keyframes[fid]
        res, masked, m = render_and_record_keyframe(
            model, kf, sh_degree, raster_cfg, bg, skip_bottom_ratio,
            mask=scene.undistort_mask(kf.camera),
        )
        rows.append((fid, m))
        if result_dir is not None:
            if record_rendered_image:
                save_image(image_dir / f"{fid}.png", masked)
            gt = None if kf.image is None else np.asarray(kf.image)
            if record_ground_truth_image and gt is not None:
                save_image(gt_dir / f"{fid}.png", gt.transpose(2, 0, 1))
            if record_loss_image and gt is not None:
                diff = np.abs(np.asarray(masked) - gt.transpose(2, 0, 1))
                save_image(loss_dir / f"{fid}.png", diff)

    if result_dir is not None:
        files = {
            "render_time.txt": "render_time_ms",
            "dssim.txt": "ssim",
            "psnr.txt": "psnr",
            "psnr_gaussian_splatting.txt": "psnr_gs",
        }
        for fname, key in files.items():
            lines = [
                f"{fid} {m[key]:.6f}" for fid, m in rows if key in m
            ]
            if lines:
                (result_dir / (fname[:-4] + name_suffix + ".txt")).write_text(
                    "\n".join(lines) + "\n"
                )

    means: Dict[str, float] = {}
    for key in ("render_time_ms", "ssim", "psnr", "psnr_gs"):
        vals = [m[key] for _, m in rows if key in m]
        if vals:
            means[key] = float(np.mean(vals))
    return means
