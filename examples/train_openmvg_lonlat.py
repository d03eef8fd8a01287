#!/usr/bin/env python
"""Train an omnidirectional Gaussian field from an openMVG scene.

The TPU analog of the reference training binaries (`/root/reference/examples/
train_360roam.cpp`, `train_egonerf_omniblender.cpp`, `train_egonerf_ricoh360.cpp`,
`train_openmvg_lonlat.cpp` — they differ only in dataset paths; float/double
PLY handling is automatic here).

Usage:
  python examples/train_openmvg_lonlat.py CFG_YAML OUTPUT_DIR SFM_JSON POINTS_PLY \
      [--image-root DIR] [--iters N]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cfg")
    ap.add_argument("output_dir")
    ap.add_argument("sfm_json")
    ap.add_argument("points_ply")
    ap.add_argument("--image-root", default=None)
    ap.add_argument("--iters", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument(
        "--viewer", type=int, default=0, metavar="PORT",
        help="serve the live interactive viewer (with the VariableParameters"
        " editor wired to this training run) on PORT while training — the"
        " analog of the reference's viewer thread"
        " (examples/train_360roam.cpp:318-324)",
    )
    ap.add_argument("--viewer-width", type=int, default=960)
    ap.add_argument(
        "--seed", type=int, default=0,
        help="training RNG seed (keyframe sampling, densify splits) — the"
        " quality gate runs two seeds and gates on their median",
    )
    args = ap.parse_args()

    import jax.numpy as jnp

    from omnigs_tpu.config import load_config
    from omnigs_tpu.io.openmvg import load_openmvg_scene
    from omnigs_tpu.train.eval import render_and_record_all_keyframes
    from omnigs_tpu.train.record import (
        save_cameras_json,
        save_model_params,
        save_ply_checkpoint,
        write_keyframe_used_times,
    )
    from omnigs_tpu.train.trainer import Trainer

    cfg = load_config(args.cfg)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    print("Loading scene…", flush=True)
    scene = load_openmvg_scene(
        args.sfm_json,
        args.points_ply,
        image_root=args.image_root,
        znear=cfg.pipe.z_near,
        zfar=cfg.pipe.z_far,
    )
    print(
        f"{len(scene.keyframes)} keyframes, {len(scene.points)} SfM points",
        flush=True,
    )

    tr = Trainer(scene, cfg, output_dir=out, seed=args.seed)
    tr.init_from_sfm()
    save_cameras_json(scene, out)
    save_model_params(
        out, cfg.model.sh_degree, cfg.model.white_background, args.sfm_json, str(out)
    )

    if args.viewer:
        from omnigs_tpu.viewer.live import start_live_viewer

        start_live_viewer(tr, scene, cfg, args.viewer, args.viewer_width)

    n_iters = args.iters or cfg.opt.max_num_iterations
    record_interval = cfg.mapper.all_keyframes_record_interval
    t0 = time.time()
    t_last, it_last = t0, 0
    fuse = cfg.tpu.fuse_steps
    while tr.iteration < n_iters:
        budget = n_iters - tr.iteration
        for interval in (args.log_every, record_interval):
            if interval:
                budget = min(budget, interval - tr.iteration % interval)
        took = tr.train_window(min(budget, fuse)) if fuse > 1 else 0
        if took == 0:
            tr.train_iteration()
        it = tr.iteration
        if args.log_every and it % args.log_every == 0:
            now = time.time()
            rate = (now - t_last) / max(it - it_last, 1) * 1000
            t_last, it_last = now, it
            print(
                f"iter {it}/{n_iters} loss={tr.drain_losses():.4f} "
                f"ema={tr.ema_loss:.4f} n={int(tr.model.num_active)} "
                f"{rate:.0f} ms/it",
                flush=True,
            )
        if record_interval and it % record_interval == 0:
            means = render_and_record_all_keyframes(
                tr.model,
                scene,
                tr.sh_degree,
                tr.raster_cfg,
                tr.bg,
                result_dir=out,
                skip_bottom_ratio=cfg.opt.skip_bottom_ratio,
                record_rendered_image=cfg.mapper.record_rendered_image,
                record_ground_truth_image=cfg.mapper.record_ground_truth_image,
                record_loss_image=cfg.mapper.record_loss_image,
            )
            print(f"eval @ {it}: {means}", flush=True)
            save_ply_checkpoint(tr.model, out, it)

    # shutdown record (`trainSfmPcd` tail, gaussian_mapper.cpp:272-288)
    from omnigs_tpu.utils.profiling import write_peak_memory

    write_peak_memory(out, tr.peak_memory)  # GpuPeakUsageMB.txt analog
    write_keyframe_used_times(tr.sampler, out / "used_times", "_shutdown")
    render_and_record_all_keyframes(
        tr.model,
        scene,
        tr.sh_degree,
        tr.raster_cfg,
        tr.bg,
        result_dir=out,
        name_suffix="_shutdown",
        skip_bottom_ratio=cfg.opt.skip_bottom_ratio,
        record_rendered_image=cfg.mapper.record_rendered_image,
        record_ground_truth_image=cfg.mapper.record_ground_truth_image,
        record_loss_image=cfg.mapper.record_loss_image,
    )
    save_ply_checkpoint(tr.model, out, tr.iteration)
    print("done.", flush=True)


if __name__ == "__main__":
    main()
