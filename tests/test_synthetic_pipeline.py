"""End-to-end pipeline on a synthesized openMVG dataset (CPU, tiny):
scene synthesis → loader → Trainer → eval metrics. Mirrors what
scripts/make_synthetic_scene.py + the example CLIs do on chip."""

import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def test_make_scene_train_eval(tmp_path):
    scene_dir = tmp_path / "scene"
    r = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "make_synthetic_scene.py"),
            str(scene_dir),
            "--width", "64", "--height", "32",
            "--gaussians", "96",
            "--train-views", "3",
            "--test-views", "1",
        ],
        capture_output=True,
        text=True,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO)},
        cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (scene_dir / "sfm_data_train.json").exists()
    assert (scene_dir / "points.ply").exists()

    from omnigs_tpu.config import Config
    from omnigs_tpu.io.openmvg import load_openmvg_scene
    from omnigs_tpu.train.eval import render_and_record_all_keyframes
    from omnigs_tpu.train.trainer import Trainer

    scene = load_openmvg_scene(
        scene_dir / "sfm_data_train.json", scene_dir / "points.ply"
    )
    assert len(scene.keyframes) == 3
    assert scene.points.shape[1] == 3

    cfg = Config()
    cfg.tpu.capacity = 128
    cfg.tpu.max_instances = 1 << 12
    cfg.tpu.tile_cap = 256
    cfg.tpu.chunk = 16
    cfg.opt.densify_from_iter = 10_000  # no densify in this smoke
    tr = Trainer(scene, cfg)
    tr.init_from_sfm()
    import jax.numpy as jnp

    first = None
    for _ in range(12):
        tr.train_iteration()
    tr.drain_losses()
    assert np.isfinite(tr.ema_loss) and tr.ema_loss > 0

    out = tmp_path / "eval"
    out.mkdir()
    means = render_and_record_all_keyframes(
        tr.model, scene, tr.sh_degree, tr.raster_cfg, tr.bg, result_dir=out
    )
    assert np.isfinite(means["psnr"]) and means["psnr"] > 5
    assert (out / "psnr.txt").exists()
    assert (out / "render_time.txt").exists()
