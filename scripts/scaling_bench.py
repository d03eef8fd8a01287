#!/usr/bin/env python
"""Weak-scaling harness: pixels/s at 1 chip → N chips (BASELINE configs 4-5).

Runs the sharded training step over (data × gauss) meshes of increasing size
and reports throughput + scaling efficiency. On a multi-chip host this
measures real ICI scaling; on a single chip it can still exercise the
sharded program with --force-host-devices N (virtual CPU devices — compiles
and validates collectives, timings not meaningful).

Usage:
  python scripts/scaling_bench.py [--width 1920 --height 960] [--gaussians 131072]
      [--meshes 1x1 1x2 2x2 ...] [--force-host-devices N]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=960)
    ap.add_argument("--gaussians", type=int, default=1 << 17)
    ap.add_argument("--meshes", nargs="*", default=None)
    ap.add_argument("--force-host-devices", type=int, default=0)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import os

    if args.force_host_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.force_host_devices}"
        ).strip()

    import jax

    if args.force_host_devices:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.model import optimizer as opt_ops
    from omnigs_tpu.ops.rasterize import RasterConfig
    from omnigs_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS, make_mesh
    from omnigs_tpu.parallel.shard import make_sharded_train_step
    from __graft_entry__ import _example_model

    n_dev = jax.device_count()
    meshes = args.meshes or [f"1x{n}" for n in (1, 2, 4, 8) if n <= n_dev]
    camera = Camera(CameraType.LONLAT, args.width, args.height)
    if args.force_host_devices:
        # virtual-device validation: XLA compositor (compiled Pallas needs
        # real hardware; timings here are not meaningful anyway)
        cfg = RasterConfig(max_instances=1 << 20, tile_cap=1024, chunk=64)
    else:
        # equal-knob configs so the 1x1-mesh run measures the pure
        # shard_map/collective TAX, not a knob change (VERDICT r3 #8 /
        # r4 #4): the FULL round-5 production config — segmented-chunk
        # kernels + depth-presorted packed binning + retuned caps — on
        # both the sharded and unsharded sides.
        cfg = RasterConfig(
            max_instances=18 << 16, backend="pallas", tight_culling=True,
            tile_culling=True, aligned_cap=8288 * 128,
            want_ncontrib=False, gather_reduce=True, depth_presort=True,
            segmented=True,
        )

    if not args.force_host_devices:
        # unsharded full-train-step baseline at the SAME cfg/loss so the
        # 1x1-mesh ratio is the pure shard_map/collective tax (bench.py's
        # headline is grad-only and not comparable)
        import functools as _ft

        from omnigs_tpu.train.trainer import train_step as _unsharded

        m0 = _example_model(capacity=args.gaussians, n=args.gaussians)
        o0 = opt_ops.init_adam(m0.params())
        fn = jax.jit(
            _ft.partial(
                _unsharded, camera=camera, sh_degree=3, raster_cfg=cfg,
                lr_cfg=opt_ops.LRConfig(), spatial_lr_scale=1.0,
                bg=jnp.zeros(3),
            )
        )
        vm0, cp0 = jnp.eye(4), jnp.zeros(3)
        gt0 = jnp.zeros((3, args.height, args.width))
        m0, o0, aux0 = fn(m0, o0, vm0, cp0, gt0, jnp.asarray(1))
        jax.block_until_ready(aux0["loss"] if "loss" in aux0 else aux0)
        t0 = time.perf_counter()
        for i in range(args.iters):
            m0, o0, aux0 = fn(m0, o0, vm0, cp0, gt0, jnp.asarray(i + 2))
        jax.block_until_ready(aux0["loss"] if "loss" in aux0 else aux0)
        dt0 = (time.perf_counter() - t0) / args.iters
        print(
            json.dumps(
                {
                    "mesh": "unsharded",
                    "ms_per_step": round(dt0 * 1000, 1),
                    "pixels_per_s": round(
                        args.width * args.height / dt0, 1
                    ),
                }
            )
        )

    base_px_s = None
    for spec in meshes:
        data, gauss = (int(v) for v in spec.split("x"))
        if data * gauss > n_dev:
            print(f"skip {spec}: only {n_dev} devices")
            continue
        mesh = make_mesh(data=data, gauss=gauss)
        model = _example_model(capacity=args.gaussians, n=args.gaussians)
        opt_state = opt_ops.init_adam(model.params())
        gspec = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(GAUSS_AXIS)), model
        )
        model = jax.device_put(model, gspec)
        ospec = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(GAUSS_AXIS)), opt_state
        ).replace(count=NamedSharding(mesh, P()))
        opt_state = jax.device_put(opt_state, ospec)
        step = make_sharded_train_step(
            mesh, camera, 3, cfg, opt_ops.LRConfig(), 1.0, bg=jnp.zeros(3)
        )
        dspec = NamedSharding(mesh, P(DATA_AXIS))
        vms = jax.device_put(jnp.tile(jnp.eye(4)[None], (data, 1, 1)), dspec)
        cps = jax.device_put(jnp.zeros((data, 3)), dspec)
        gts = jax.device_put(
            jnp.zeros((data, 3, args.height, args.width)), dspec
        )
        model, opt_state, aux = step(
            model, opt_state, vms, cps, gts, jnp.asarray(1)
        )
        jax.block_until_ready(aux["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            model, opt_state, aux = step(
                model, opt_state, vms, cps, gts, jnp.asarray(i + 2)
            )
        jax.block_until_ready(aux["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        px_s = args.width * args.height * data / dt
        if base_px_s is None:
            base_px_s = px_s / (data * gauss)
        eff = px_s / (base_px_s * data * gauss)
        print(
            json.dumps(
                {
                    "mesh": spec,
                    "ms_per_step": round(dt * 1000, 1),
                    "pixels_per_s": round(px_s, 1),
                    "scaling_efficiency": round(eff, 4),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
