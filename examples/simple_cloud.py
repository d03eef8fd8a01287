#!/usr/bin/env python
"""The numerical smoke test — `simple_cloud` analog
(`/root/reference/examples/simple_cloud.cpp:126-230`): 3 hand-placed colored
Gaussians, identity pose, equirect render to an image file.

Usage: python examples/simple_cloud.py OUTPUT_DIR [dist] [--width W] [--height H]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("dist", type=float, nargs="?", default=2.0)
    ap.add_argument("--width", type=int, default=2000)
    ap.add_argument("--height", type=int, default=1000)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.model.gaussians import GaussianModel, from_pcd, inverse_sigmoid
    from omnigs_tpu.ops.knn import mean_sq_knn_dist
    from omnigs_tpu.ops.rasterize import RasterConfig
    from omnigs_tpu.train.eval import save_image
    from omnigs_tpu.train.renderer import render_model

    d = args.dist
    pts = jnp.array(
        [[d, -5 * d, d], [-d, 0.5 * d, -0.7 * d], [d, d, -d]], jnp.float32
    )
    cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], jnp.float32)
    model = from_pcd(pts, cols, 3, mean_sq_knn_dist(pts))
    # the reference's overrides (`simple_cloud.cpp:224-226`)
    model = model.replace(
        scaling=jnp.full_like(model.scaling, -0.3),
        opacity=jnp.full_like(model.opacity, 5.0),
    )

    import jax

    camera = Camera(CameraType.LONLAT, args.width, args.height)
    backend = "pallas" if jax.default_backend() != "cpu" else "xla"
    res = render_model(
        model,
        camera,
        jnp.eye(4),
        jnp.zeros(3),
        jnp.zeros(3),
        sh_degree=0,
        config=RasterConfig(
            max_instances=1 << 16, tile_cap=64, chunk=16, backend=backend
        ),
    )
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    save_image(out / "simple_cloud.png", np.asarray(res.image))
    print(f"wrote {out/'simple_cloud.png'}", flush=True)


if __name__ == "__main__":
    main()
