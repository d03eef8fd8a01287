#!/usr/bin/env python
"""Measure the POTENTIAL of sub-tile (8×8) early termination before paying
for kernel surgery (VERDICT r3 task 5 / BENCH backlog r4 #2).

The kernels' chunk loop stops when every pixel of the 16×16 tile is
saturated (max N < T_STOP). Per-pixel stop ranks are exactly what
``n_contrib`` records, so one forward pass at the bench workload yields the
exact chunk counts a quadrant-granular (or any sub-tile) termination would
execute:

  whole-tile chunks  = Σ_t ceil(max_px n_contrib / 128)        (status quo)
  quadrant chunks    = Σ_t Σ_q ceil(max_q n_contrib / 128) / 4 (hypothetical)

If the ratio is close to 1, sub-tile termination cannot pay and the idea is
recorded as analysis-dead without touching the kernels. Run ON CHIP:
  python scripts/subtile_analysis.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_model
    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops.rasterize import RasterConfig, rasterize
    from omnigs_tpu.ops.preprocess import TILE, tile_grid

    cam = Camera(CameraType.LONLAT, 1920, 960)
    gx, gy = tile_grid(cam)
    model = _example_model(capacity=1 << 17, n=1 << 17)
    cfg = RasterConfig(
        max_instances=26 << 16,
        aligned_cap=8704 * 128,
        backend="pallas",
        tight_culling=True,
        tile_culling=True,
        want_ncontrib=True,
    )

    @jax.jit
    def render(m):
        from omnigs_tpu.train.renderer import render_model

        return render_model(
            m, cam, jnp.eye(4), jnp.zeros(3), jnp.zeros(3), sh_degree=3,
            config=cfg,
        )

    res = render(model)
    nc = np.asarray(res.n_contrib)  # (H, W) stop ranks (0 = nothing)
    H, W = nc.shape
    nc = nc.reshape(gy, TILE, gx, TILE).transpose(0, 2, 1, 3)  # (gy,gx,16,16)
    CH = 128

    def chunks(maxr):
        return np.ceil(maxr / CH)

    whole = chunks(nc.reshape(gy, gx, -1).max(-1)).sum() * 4  # ×4 quadrants
    # 8×8 quadrants
    q = nc.reshape(gy, gx, 2, 8, 2, 8).transpose(0, 1, 2, 4, 3, 5)
    quad = chunks(q.reshape(gy, gx, 4, -1).max(-1)).sum()
    # 8×16 halves (cheaper restructuring: split sublane axis only)
    h = nc.reshape(gy, gx, 2, 8, 16)
    half = chunks(h.reshape(gy, gx, 2, -1).max(-1)).sum() * 2
    print(
        f"quadrant-chunk-work / whole-tile: {quad / whole:.4f} "
        f"(halves: {half / whole:.4f}) — upper bound on kernel-time saving "
        f"= 1 − ratio (plus per-quadrant branch overhead)"
    )


if __name__ == "__main__":
    main()
