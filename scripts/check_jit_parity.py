#!/usr/bin/env python
"""Regression check: jitted full render must match the eager pipeline.

Guards the binning layout invariant against XLA producer-duplication
rounding divergence (see the optimization_barrier note in
omnigs_tpu/ops/preprocess.py). Must run on the real TPU — the CPU test
suite cannot reproduce the fusion behavior.

Exit 0 iff max |jit - eager| image error < 0.05 at bench scale (observed:
~0.0025 healthy, ~0.78 when the invariant is broken).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops.rasterize import RasterConfig
    from omnigs_tpu.train.renderer import render_model
    from __graft_entry__ import _example_model

    model = _example_model(capacity=1 << 17, n=1 << 17)
    cam = Camera(CameraType.LONLAT, 1920, 960)
    cfg = RasterConfig(
        max_instances=26 << 16,
        backend="pallas",
        tight_culling=True,
        tile_culling=True,
    )

    def render():
        return render_model(
            model, cam, jnp.eye(4), jnp.zeros(3), jnp.zeros(3),
            sh_degree=3, config=cfg,
        )

    # Staged-jit reference: preprocess, binning, and compositing jitted
    # SEPARATELY, so every stage boundary is materialized exactly like eager
    # execution — the whole-program jit cannot clone producer chains across
    # those boundaries. This catches the XLA fusion-duplication class (the
    # rect rounding divergence) at full scale without eager's thousands of
    # per-op dispatches (infeasible over the tunnel on a cold compile cache).
    from omnigs_tpu.ops.binning import bin_instances
    from omnigs_tpu.ops.pallas_raster import composite_instances
    from omnigs_tpu.ops.preprocess import TILE, preprocess, tile_grid
    from omnigs_tpu.ops.rasterize import _tiles_to_image

    gx, gy = tile_grid(cam)

    @jax.jit
    def staged_prep():
        return preprocess(
            model.xyz, model.get_scaling(), model.get_rotation(),
            model.get_opacity(), model.get_features(), cam,
            jnp.eye(4), jnp.zeros(3), 3, active_mask=model.active,
            tight_culling=True,
        )

    prep = jax.block_until_ready(staged_prep())
    binned = jax.block_until_ready(
        jax.jit(
            lambda p: bin_instances(
                p, gx, gy, cfg.max_instances, tile_cull=True
            )
        )(prep)
    )
    import numpy as _np

    t_ids = _np.arange(gx * gy)
    x0 = jnp.asarray((t_ids % gx) * TILE, jnp.int32)
    y0 = jnp.asarray((t_ids // gx) * TILE, jnp.int32)

    @jax.jit
    def staged_comp(prep, sorted_g, starts, counts):
        color_t, _, _ = composite_instances(
            prep.means2d, prep.conic, prep.rgb, prep.opacity,
            jnp.zeros(3), sorted_g, starts, counts, x0, y0,
            None, None, None, None, None, gx * gy, False,
        )
        return _tiles_to_image(color_t, gx, gy, cam.width, cam.height)

    staged_img = staged_comp(
        prep, binned.sorted_g, binned.starts, binned.counts
    )
    jitted = jax.jit(render)()
    err = float(jnp.abs(jitted.image - staged_img).max())
    ok = err < 0.05
    print(
        f"jit-vs-staged max image error: {err:.6f}  "
        f"({'OK' if ok else 'FAIL'})"
    )

    # Cross-backend check at reduced scale: the Pallas pipeline (binning +
    # kernels) must match the independent XLA compositor ON CHIP. Catches
    # whole-pipeline breakage that jit-vs-eager can't (e.g. the TPU
    # denormal-flush-in-transpose bug zeroed the emission offsets in BOTH
    # jit and eager, rendering almost nothing, and still "matched").
    small = _example_model(capacity=1 << 14, n=1 << 14)
    cam_s = Camera(CameraType.LONLAT, 640, 320)
    cfg_p = RasterConfig(
        max_instances=1 << 18, backend="pallas",
        tight_culling=True, tile_culling=True,
    )
    cfg_x = RasterConfig(
        max_instances=1 << 18, backend="xla", tile_cap=2048,
        tight_culling=True,
    )

    def render_small(cfg):
        return jax.jit(lambda: render_model(
            small, cam_s, jnp.eye(4), jnp.zeros(3), jnp.zeros(3),
            sh_degree=3, config=cfg,
        ))()

    rp, rx = render_small(cfg_p), render_small(cfg_x)
    xerr = float(jnp.abs(rp.image - rx.image).max())
    xmean = float(jnp.abs(rx.image).mean())
    xok = xerr < 0.05 and xmean > 1e-3
    print(
        f"pallas-vs-xla max image error: {xerr:.6f} "
        f"(mean |img| {xmean:.4f})  ({'OK' if xok else 'FAIL'})"
    )

    # Pinhole camera path (perspective projection + full-proj matrix) on
    # chip: pallas vs xla.
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(
        0, str(_Path(__file__).resolve().parent.parent / "tests")
    )
    from helpers import random_cloud

    from omnigs_tpu.cameras import focal2fov
    from omnigs_tpu.ops.rasterize import rasterize
    from omnigs_tpu.scene.keyframe import getProjectionMatrix

    pcam = Camera(
        CameraType.PINHOLE, 640, 480, fx=400.0, fy=400.0, cx=320.0, cy=240.0
    )
    pp = random_cloud(jax.random.PRNGKey(5), 256)
    pp["means3d"] = pp["means3d"] + jnp.array([0.0, 0.0, 4.0])
    proj = jnp.asarray(
        getProjectionMatrix(
            0.01, 100.0, focal2fov(400.0, 640), focal2fov(400.0, 480)
        )
    )

    def render_pin(backend, **kw):
        pcfg = RasterConfig(
            max_instances=1 << 18, backend=backend, tile_cap=1024, **kw
        )
        return rasterize(
            pp["means3d"], pp["scales"], pp["quats"], pp["opacities"],
            pp["shs"], camera=pcam, viewmatrix=jnp.eye(4),
            campos=jnp.zeros(3), bg=jnp.array([0.1, 0.2, 0.3]), sh_degree=2,
            config=pcfg, full_proj=proj @ jnp.eye(4),
        )

    px = jax.jit(lambda: render_pin("xla"))()
    pl_ = jax.jit(
        lambda: render_pin("pallas", tight_culling=True, tile_culling=True)
    )()
    perr = float(jnp.abs(px.image - pl_.image).max())
    pmean = float(jnp.abs(px.image).mean())
    pok = perr < 0.01 and pmean > 0.05
    print(
        f"pinhole pallas-vs-xla max image error: {perr:.6f} "
        f"(mean |img| {pmean:.4f})  ({'OK' if pok else 'FAIL'})"
    )

    # Gradient parity at full bench scale: the compact layout's backward —
    # with the round-3 production knobs (bench.py's exact config:
    # want_ncontrib off, retuned caps) — vs the ghost-aligned layout's
    # scatter-add backward. Same composited sequence through two
    # independent layouts — grads must agree to accumulation-order noise.
    import dataclasses

    from omnigs_tpu.ops import loss as loss_ops

    gt = jnp.zeros((3, 960, 1920))
    # caps sized to the re-measured truncation-free workload (1.02M
    # surviving instances; ghost layout additionally pads each tile to a
    # chunk multiple)
    # bench.py's exact round-5 production config (segmented-chunk kernels,
    # retuned caps, packed-key presort; gather_reduce auto-demoted under
    # segmented) vs the ghost-aligned tile-major scatter backward — same
    # composited sequence through two fully independent slab layouts, two
    # kernel families AND two reduction algorithms
    cfg_c = RasterConfig(
        max_instances=18 << 16, backend="pallas", tight_culling=True,
        tile_culling=True, aligned_cap=8288 * 128,
        want_ncontrib=False, gather_reduce=True, depth_presort=True,
        segmented=True,
    )
    cfg_g = dataclasses.replace(
        cfg_c, ghost_align=True, aligned_cap=None, gather_reduce=False,
        depth_presort=False, segmented=False,
    )

    def grad_fn(cfg):
        def loss(params):
            m = model.with_params(params)
            res = render_model(
                m, cam, jnp.eye(4), jnp.zeros(3), jnp.zeros(3),
                sh_degree=3, config=cfg,
            )
            return loss_ops.l1_loss(res.image, gt)

        return jax.jit(jax.grad(loss))(model.params())

    g_c, g_g = grad_fn(cfg_c), grad_fn(cfg_g)
    gok = True
    for k in g_c:
        ref = g_g[k]
        scale = float(jnp.abs(ref).max()) + 1e-20
        gerr = float(jnp.abs(g_c[k] - ref).max()) / scale
        this_ok = gerr < 2e-3
        gok = gok and this_ok
        print(
            f"grad[{k}] compact-vs-ghost rel err: {gerr:.2e}  "
            f"({'OK' if this_ok else 'FAIL'})"
        )

    # Committed golden arrays (tests/goldens/*.npz, pinned from the oracle
    # on CPU) checked with the COMPILED Pallas kernels on chip — the
    # on-hardware leg of tests/test_goldens.py (interpret mode can pass
    # while compiled Mosaic diverges). Two tolerances:
    #   * vs the on-chip XLA backend at the SAME inputs: TIGHT (2e-3) —
    #     both backends share the chip's transcendental implementations, so
    #     any gap here is a Mosaic kernel bug;
    #   * vs the CPU-pinned goldens: HARDWARE tolerance (3e-2 rel) — the
    #     TPU's exp/log differ from CPU libm by a few ULP and the
    #     compositing chain amplifies them (round-3 gate finding: compiled
    #     Pallas ~1e-2 off the CPU goldens while agreeing with on-chip XLA
    #     to 6e-5 at the larger cross-backend configs); this leg only
    #     catches gross semantic drift.
    import numpy as np

    golden_dir = _Path(__file__).resolve().parent.parent / "tests" / "goldens"
    golden_ok = True
    for fname, gw, gh, gdeg in (
        ("simple_cloud.npz", 512, 256, 0),
        ("random_cloud.npz", 256, 128, 3),
    ):
        data = np.load(golden_dir / fname)
        gcam = Camera(CameraType.LONLAT, gw, gh)
        gcfg = RasterConfig(
            max_instances=1 << 15, backend="pallas", tile_culling=True,
        )
        gcfg_x = RasterConfig(max_instances=1 << 15, tile_cap=256, chunk=32)
        args = tuple(
            jnp.asarray(data[f"in_{k}"])
            for k in ("means3d", "scales", "quats", "opacities", "shs")
        )
        w = jnp.asarray(data["loss_w"])

        def run(cfg):
            def fwd(*a):
                return rasterize(
                    *a, camera=gcam, viewmatrix=jnp.eye(4),
                    campos=jnp.zeros(3), bg=jnp.array([0.1, 0.2, 0.3]),
                    sh_degree=gdeg, config=cfg,
                )

            img = jax.jit(lambda *a: fwd(*a).image)(*args)
            grads = jax.jit(
                jax.grad(
                    lambda *a: jnp.sum(fwd(*a).image * w),
                    argnums=(0, 1, 2, 3, 4),
                )
            )(*args)
            return img, grads

        p_img, p_grads = run(gcfg)
        x_img, x_grads = run(gcfg_x)

        for ref_img, ref_grads, tag, tol_i, tol_g in (
            (x_img, x_grads, "vs-chip-xla", 2e-3, 2e-3),
            (
                jnp.asarray(data["image"]),
                [jnp.asarray(data[k]) for k in (
                    "g_means3d", "g_scales", "g_quats", "g_opacities",
                    "g_shs",
                )],
                "vs-cpu-golden", 3e-2, 3e-2,
            ),
        ):
            goerr = float(jnp.abs(p_img - ref_img).max())
            this_ok = goerr < tol_i
            golden_ok = golden_ok and this_ok
            print(
                f"golden[{fname}] {tag} max image error: {goerr:.6f}  "
                f"({'OK' if this_ok else 'FAIL'})"
            )
            for garr, ref, gname in zip(
                p_grads, ref_grads,
                ("g_means3d", "g_scales", "g_quats", "g_opacities", "g_shs"),
            ):
                gscale = float(jnp.abs(jnp.asarray(ref)).max()) or 1.0
                ggerr = float(jnp.abs(garr - jnp.asarray(ref)).max()) / gscale
                g_ok = ggerr < tol_g
                golden_ok = golden_ok and g_ok
                print(
                    f"golden[{fname}] {tag} {gname} rel err: {ggerr:.2e}  "
                    f"({'OK' if g_ok else 'FAIL'})"
                )

    # Knob-parity legs (compiled Mosaic on chip — ADVICE r3 #3: the
    # interpret-mode tests can pass while compiled kernels diverge): every
    # off-default raster knob must produce the same gradients as the default
    # path at reduced scale. Reference grads: the small compact config.
    from omnigs_tpu.ops import pallas_raster as _pr

    def grad_small(cfg):
        def loss(params):
            m = small.with_params(params)
            res = render_model(
                m, cam_s, jnp.eye(4), jnp.zeros(3), jnp.zeros(3),
                sh_degree=3, config=cfg,
            )
            return loss_ops.l1_loss(res.image, jnp.zeros((3, 320, 640)))

        return jax.jit(jax.grad(loss))(small.params())

    g_ref = grad_small(cfg_p)
    kok = True

    def check_knob(name, g_var, tol=2e-3):
        nonlocal kok
        for k in g_ref:
            scale = float(jnp.abs(g_ref[k]).max()) + 1e-20
            kerr = float(jnp.abs(g_var[k] - g_ref[k]).max()) / scale
            this_ok = kerr < tol
            kok = kok and this_ok
            print(
                f"knob[{name}] grad[{k}] rel err: {kerr:.2e}  "
                f"({'OK' if this_ok else 'FAIL'})"
            )

    check_knob(
        "gather_reduce", grad_small(
            dataclasses.replace(cfg_p, gather_reduce=True)
        )
    )
    check_knob(
        "depth_presort", grad_small(
            dataclasses.replace(cfg_p, depth_presort=True)
        )
    )
    check_knob(
        "gather+presort", grad_small(
            dataclasses.replace(
                cfg_p, gather_reduce=True, depth_presort=True
            )
        )
    )
    check_knob(
        "fused_reduce", grad_small(
            dataclasses.replace(cfg_p, fused_reduce=True)
        )
    )
    check_knob(
        "segmented", grad_small(
            dataclasses.replace(
                cfg_p, segmented=True, want_ncontrib=False
            )
        )
    )
    check_knob(
        "seg+presort", grad_small(
            dataclasses.replace(
                cfg_p, segmented=True, want_ncontrib=False,
                depth_presort=True,
            )
        )
    )
    # α-formulation A/B: module-level knob, read at trace time
    _prev_alpha = _pr.ALPHA_MODE
    _pr.ALPHA_MODE = "mm"
    try:
        g_mm = grad_small(dataclasses.replace(cfg_p, want_ncontrib=False))
    finally:
        _pr.ALPHA_MODE = _prev_alpha
    check_knob("alpha=mm", g_mm)

    sys.exit(0 if (ok and xok and gok and pok and golden_ok and kok) else 1)


if __name__ == "__main__":
    main()
