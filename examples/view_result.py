#!/usr/bin/env python
"""Interactive viewer on a saved model — `view_result` analog
(`/root/reference/examples/view_result.cpp`), served over HTTP instead of
GLFW (TPU hosts are headless).

Usage: python examples/view_result.py MODEL_PLY [--width W] [--height H] [--port P]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model_ply")
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.io.ply import load_gaussian_ply
    from omnigs_tpu.ops.rasterize import RasterConfig
    from omnigs_tpu.train.renderer import render_model
    from omnigs_tpu.viewer.server import serve

    model = load_gaussian_ply(args.model_ply)
    camera = Camera(CameraType.LONLAT, args.width, args.height)
    cfg = RasterConfig(
        max_instances=1 << 21,
        backend="pallas" if jax.default_backend() != "cpu" else "xla",
        tight_culling=True,
        tile_culling=jax.default_backend() != "cpu",
        aligned_cap=(1 << 21) * 5 // 8,
    )

    @jax.jit
    def _render_color(vm, campos, scale):
        # CHW -> HWC at the io boundary (the viewer encodes a PNG)
        return render_model(
            model, camera, vm, campos, jnp.zeros(3), 3, cfg,
            scale_modifier=scale,
        ).image.transpose(1, 2, 0)

    @jax.jit
    def _render_depth(vm, campos, scale):
        res = render_model(
            model, camera, vm, campos, jnp.zeros(3), 3, cfg,
            render_depth=True, scale_modifier=scale,
        )
        d = res.image[0]
        return jnp.repeat(
            (d / (jnp.max(d) + 1e-6))[..., None], 3, axis=-1
        )

    def render_fn(vm, campos, mode, scale=1.0):
        f = _render_depth if mode == "depth" else _render_color
        return f(jnp.asarray(vm), jnp.asarray(campos), jnp.asarray(scale))

    serve(render_fn, args.width, args.height, args.port)


if __name__ == "__main__":
    main()
