#!/usr/bin/env python
"""Synthesize a self-contained openMVG-format lonlat dataset for end-to-end
pipeline checks (no reference analog — the reference assumes 360Roam/EgoNeRF
downloads): a ground-truth Gaussian cloud is rendered from posed virtual
cameras; images, sfm_data_{train,test}.json, and a noisy initial point cloud
are written so `examples/train_openmvg_lonlat.py` + `test_openmvg_lonlat.py`
run unmodified.

Usage:
  python scripts/make_synthetic_scene.py OUT_DIR [--width 512] [--height 256]
      [--gaussians 4096] [--train-views 12] [--test-views 4] [--seed 0]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PTR_WRAPPER_ID = 2147483649
POLYMORPHIC_ID = 1073741824


def _sfm_json(views, width, height, root_path):
    json_views, json_extrs = [], []
    for i, (R_cw, center, fname) in enumerate(views):
        json_views.append(
            {
                "key": i,
                "value": {
                    "polymorphic_id": POLYMORPHIC_ID,
                    "ptr_wrapper": {
                        "id": PTR_WRAPPER_ID + i,
                        "data": {
                            "local_path": "",
                            "filename": fname,
                            "width": width,
                            "height": height,
                            "id_view": i,
                            "id_intrinsic": 0,
                            "id_pose": i,
                        },
                    },
                },
            }
        )
        json_extrs.append(
            {
                "key": i,
                "value": {
                    "rotation": R_cw.tolist(),
                    "center": center.tolist(),
                },
            }
        )
    intr = [
        {
            "key": 0,
            "value": {
                "polymorphic_id": POLYMORPHIC_ID,
                "polymorphic_name": "spherical",
                "ptr_wrapper": {
                    "id": PTR_WRAPPER_ID,
                    "data": {"value0": {"width": width, "height": height}},
                },
            },
        }
    ]
    return {
        "sfm_data_version": "0.3",
        "root_path": str(root_path),
        "views": json_views,
        "intrinsics": intr,
        "extrinsics": json_extrs,
        "structure": [],
        "control_points": [],
    }


def _yaw_matrix(theta):
    import numpy as np

    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--gaussians", type=int, default=4096)
    ap.add_argument("--train-views", type=int, default=12)
    ap.add_argument("--test-views", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.io.ply import save_points_ply
    from omnigs_tpu.model.gaussians import GaussianModel, inverse_sigmoid
    from omnigs_tpu.ops import sh as sh_ops
    from omnigs_tpu.ops.rasterize import RasterConfig
    from omnigs_tpu.scene.keyframe import pose_from_center
    from omnigs_tpu.train.eval import save_image
    from omnigs_tpu.train.renderer import render_model

    out = Path(args.out_dir)
    (out / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n = args.gaussians

    # ground-truth cloud: a colored shell (radius 2-6) around the camera
    # volume plus a floor disk — everything an equirect camera sees is
    # covered, so the background term never dominates the loss
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    r = 2.0 + 4.0 * rng.random((n, 1))
    xyz = d * r
    floor = rng.random(n) < 0.25
    xyz[floor, 1] = -1.5
    colors = 0.15 + 0.7 * rng.random((n, 3))

    gt = GaussianModel.empty(n)
    gt = gt.replace(
        xyz=jnp.asarray(xyz, jnp.float32),
        features_dc=jnp.asarray(
            sh_ops.rgb2sh(jnp.asarray(colors, jnp.float32))
        )[:, None, :],
        scaling=jnp.full((n, 3), np.log(0.12), jnp.float32),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        opacity=jnp.full((n, 1), float(inverse_sigmoid(0.8)), jnp.float32),
        active=jnp.ones((n,), bool),
    )

    camera = Camera(CameraType.LONLAT, args.width, args.height)
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    cfg = RasterConfig(
        max_instances=1 << 20,
        backend=backend,
        tile_cap=2048,
        tight_culling=True,
        tile_culling=backend == "pallas",
    )

    @jax.jit
    def render(vm, campos):
        return render_model(
            gt, camera, vm, campos, jnp.zeros(3), sh_degree=0, config=cfg
        ).image

    def make_views(count, tag, rng):
        views = []
        for i in range(count):
            center = np.array(
                [rng.uniform(-1, 1), rng.uniform(-0.5, 0.5), rng.uniform(-1, 1)]
            )
            R_wc = _yaw_matrix(rng.uniform(0, 2 * np.pi))
            R_cw_in = R_wc.T  # openMVG stores R_cw with camera center
            R_cw, t_cw = pose_from_center(
                R_cw_in.astype(np.float32), center.astype(np.float32)
            )
            vm = np.eye(4, dtype=np.float32)
            vm[:3, :3] = R_cw
            vm[:3, 3] = t_cw
            img = render(jnp.asarray(vm), jnp.asarray(center, jnp.float32))
            fname = f"{tag}_{i:03d}.png"
            save_image(out / "images" / fname, np.asarray(img))
            views.append((R_cw_in, center, fname))
        return views

    train_views = make_views(args.train_views, "train", rng)
    test_views = make_views(args.test_views, "test", rng)

    for tag, views in (("train", train_views), ("test", test_views)):
        (out / f"sfm_data_{tag}.json").write_text(
            json.dumps(
                _sfm_json(views, args.width, args.height, out / "images"),
                indent=1,
            )
        )

    # noisy initial cloud: GT positions + 2% jitter, half the points
    keep = rng.random(n) < 0.5
    pts = xyz[keep] + rng.normal(scale=0.08, size=(keep.sum(), 3))
    save_points_ply(
        out / "points.ply",
        np.asarray(pts, np.float32),
        np.asarray(colors[keep], np.float32),
    )
    print(
        f"wrote {args.train_views} train + {args.test_views} test views, "
        f"{int(keep.sum())} seed points -> {out}"
    )


if __name__ == "__main__":
    main()
