#!/usr/bin/env python
"""Evaluate a trained PLY on a test split — `test_openmvg_lonlat` analog
(`/root/reference/examples/test_openmvg_lonlat.cpp:196-245`).

Usage:
  python examples/test_openmvg_lonlat.py CFG_YAML OUTPUT_DIR SFM_JSON MODEL_PLY \
      [--image-root DIR]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cfg")
    ap.add_argument("output_dir")
    ap.add_argument("sfm_json")
    ap.add_argument("model_ply")
    ap.add_argument("--image-root", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from omnigs_tpu.config import load_config
    from omnigs_tpu.io.openmvg import load_openmvg_scene
    from omnigs_tpu.io.ply import load_gaussian_ply
    from omnigs_tpu.ops.rasterize import RasterConfig
    from omnigs_tpu.train.eval import render_and_record_all_keyframes

    cfg = load_config(args.cfg)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    scene = load_openmvg_scene(
        args.sfm_json,
        None,
        image_root=args.image_root,
        znear=cfg.pipe.z_near,
        zfar=cfg.pipe.z_far,
    )
    # load with active_sh = max (`gaussian_model.cpp:975`)
    from omnigs_tpu.config import raster_config_from

    model = load_gaussian_ply(args.model_ply, capacity=cfg.tpu.capacity)
    raster_cfg = raster_config_from(cfg)
    bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
    means = render_and_record_all_keyframes(
        model,
        scene,
        cfg.model.sh_degree,
        raster_cfg,
        bg,
        result_dir=out,
        name_suffix="_test",
        skip_bottom_ratio=cfg.opt.skip_bottom_ratio,
        record_rendered_image=cfg.mapper.record_rendered_image,
        record_ground_truth_image=cfg.mapper.record_ground_truth_image,
        record_loss_image=cfg.mapper.record_loss_image,
    )
    print(means, flush=True)


if __name__ == "__main__":
    main()
