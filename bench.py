#!/usr/bin/env python
"""Benchmark: fwd+bwd pixels/s per chip at 1920×960 equirect (BASELINE metric).

Runs the full differentiable render (loss → all param grads) on one chip with
a realistic Gaussian count, reports ONE JSON line:
  {"metric": "pixels_per_s_fwdbwd_1920x960", "value": N, "unit": "pixels/s",
   "vs_baseline": R}

vs_baseline compares against an RTX 3090-class reference estimate for the
same workload. The reference repo publishes no numbers, so the 8.3e7 px/s
denominator is DERIVED in BASELINE.md ("Derivation of the 8.3e7 px/s
comparison denominator"): bracketed from published 3DGS render rates ×
measured fwd:bwd ratios (6.3e7–1.0e8) and from published end-to-end training
times (4–6e7, converged-scene loads); 8.3e7 sits at the generous end of the
overlap. Recorded for trend tracking, not sign-off.
"""

import json
import os
import time

# persistent repo-local compile cache: the round-end driver invocation and
# the in-round sprints share compiles (the tunneled chip's remote-compile
# service can take minutes per program and occasionally wedges — BENCH.md
# round-2 findings; a warm cache sidesteps both)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jaxcache"),
)


def main():
    import jax
    import jax.numpy as jnp

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops import loss as loss_ops
    from omnigs_tpu.ops.rasterize import RasterConfig
    from omnigs_tpu.train.renderer import render_model
    from __graft_entry__ import _example_model

    W, H = 1920, 960
    P = 1 << 17  # 131k Gaussians (360Roam-scale mid-training)
    camera = Camera(CameraType.LONLAT, W, H)
    # Caps sized to the measured post-cull emission (1.02M surviving
    # instances, re-measured round 3 — kernel_bench prints emitted/truncated)
    # with ~25% headroom: ZERO truncation at this workload, and the sort /
    # gathers / reduction scale with these (VERDICT r2 item 1b sanctions the
    # cap retune; the workload model itself is untouched since round 2).
    # Env overrides let the chip sprint A/B the round-4 structural knobs
    # without editing this file between runs; the committed defaults below
    # are the measured winners.
    # Defaults are the measured round-5 winners (BENCH.md r5 e2e A/B:
    # tile-major best 24.5 → segmented kernels 27.2 → r8/emission cap
    # retune 31.5 Mpix/s). max_instances 18·2^16 = post-superblock-cull
    # emission budget (~1.10M) + 7% headroom; aligned_cap 8288·128 =
    # measured slab8 high-water mark (1.048M) + 1.2% — both
    # truncation-free (kernel_bench counters). gather_reduce is demoted
    # under segmented (rasterize.py rule — measured loser there).
    cfg = RasterConfig(
        max_instances=int(
            os.environ.get("OMNIGS_MAX_INSTANCES", str(18 << 16))
        ),
        backend="pallas", tight_culling=True,
        tile_culling=True,
        aligned_cap=int(
            os.environ.get("OMNIGS_ALIGNED_CAP", str(8288 * 128))
        ),
        # n_contrib diagnostic off in the training step (output-equivalent;
        # chip-gated by check_jit_parity's full-scale grad leg)
        want_ncontrib=False,
        gather_reduce=os.environ.get("OMNIGS_GATHER_REDUCE", "1") == "1",
        depth_presort=os.environ.get("OMNIGS_DEPTH_PRESORT", "1") == "1",
        segmented=os.environ.get("OMNIGS_SEGMENTED", "1") == "1",
    )
    quick = os.environ.get("OMNIGS_BENCH_QUICK", "0") == "1"
    model = _example_model(capacity=P, n=P)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, H, W))

    def make_step(loss):
        def loss_fn(params):
            m = model.with_params(params)
            res = render_model(
                m, camera, vm, campos, bg, sh_degree=3, config=cfg
            )
            return loss(res.image, gt)

        return jax.jit(jax.grad(loss_fn))

    def timeit(step, params, n_iter=10):
        g = step(params)  # warmup/compile
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            g = step(params)
        jax.block_until_ready(g)
        return (time.perf_counter() - t0) / n_iter

    params = model.params()
    # headline metric: L1-only loss — PINNED since round 2 for trend
    # comparability (VERDICT r2 weak #1)
    dt = timeit(make_step(loss_ops.l1_loss), params)
    pixels_per_s = W * H / dt
    if quick:
        # A/B sprint mode: headline program only (each extra program is a
        # multi-minute remote compile on the tunneled chip)
        print(json.dumps({
            "metric": "pixels_per_s_fwdbwd_1920x960",
            "value": round(pixels_per_s, 1),
            "unit": "pixels/s",
            "quick": True,
            "knobs": {
                "gather_reduce": cfg.gather_reduce,
                "depth_presort": cfg.depth_presort,
                "segmented": cfg.segmented,
                "max_instances": cfg.max_instances,
            },
        }))
        return
    # protocol-step metric: the real training loss 0.8·L1 + 0.2·(1−SSIM)
    # (≡ /root/reference/src/gaussian_mapper.cpp:403-413) so px/s also
    # covers the SSIM conv + VJP cost (VERDICT r2 item 5)
    dt_proto = timeit(make_step(loss_ops.training_loss), params)
    proto_pixels_per_s = W * H / dt_proto

    # Second pinned workload (VERDICT r4 next-round #6): a CONVERGED scene
    # — the 32010-iteration protocol model (results/protocol_r4f metrics;
    # checkpoint + scene at the pinned on-disk paths) rendered from its
    # first train view. Validates that kernel conclusions drawn at the
    # mid-training 142-instances/tile frame generalize to the
    # high-density regime. Skipped (field absent) when the artifacts are
    # not on disk — the headline metric is unaffected.
    converged_px_s = None
    conv_depth = None
    _here = os.path.dirname(os.path.abspath(__file__))
    # preferred: repo-local regeneration (results_local/, gitignored —
    # protocol_run.sh defaults); fallback: the round-4/5 out-of-repo
    # locations (wiped between driver sessions)
    _cands = [
        (
            os.path.join(_here, "results_local/proto_out/32010/ply/point_cloud.ply"),
            os.path.join(_here, "results_local/scene_fullres/sfm_data_train.json"),
        ),
        (
            "/root/proto_r4f/32010/ply/point_cloud.ply",
            "/root/scene_fullres/sfm_data_train.json",
        ),
    ]
    ply_path = scene_json = None
    for _p, _s in _cands:
        if os.path.exists(_p) and os.path.exists(_s):
            ply_path, scene_json = _p, _s
            break
    if ply_path is not None:
        from omnigs_tpu.io.openmvg import load_openmvg_scene
        from omnigs_tpu.io.ply import load_gaussian_ply

        cmodel = load_gaussian_ply(ply_path, capacity=1 << 19)
        cscene = load_openmvg_scene(scene_json, None, image_root=None)
        kf = cscene.keyframes[sorted(cscene.keyframes)[0]]
        cvm = jnp.asarray(kf.viewmatrix)
        ccp = jnp.asarray(kf.campos)
        import dataclasses as _dc

        ccfg = _dc.replace(
            cfg, max_instances=1 << 22, aligned_cap=40 << 16
        )

        def conv_loss(params):
            m = cmodel.with_params(params)
            res = render_model(
                m, camera, cvm, ccp, bg, sh_degree=3, config=ccfg
            )
            return loss_ops.l1_loss(res.image, gt)

        conv_step = jax.jit(jax.grad(conv_loss))
        cparams = cmodel.params()
        dt_conv = timeit(conv_step, cparams)
        converged_px_s = W * H / dt_conv

        from omnigs_tpu.ops.binning import bin_instances as _bi
        from omnigs_tpu.ops.preprocess import preprocess as _pp
        from omnigs_tpu.ops.preprocess import tile_grid as _tg

        cgx, cgy = _tg(camera)

        @jax.jit
        def _conv_count():
            prep = _pp(
                cmodel.xyz,
                jnp.exp(cmodel.scaling),
                cmodel.rotation
                / jnp.linalg.norm(cmodel.rotation, axis=-1, keepdims=True),
                jax.nn.sigmoid(cmodel.opacity[:, 0]),
                jnp.concatenate(
                    [cmodel.features_dc, cmodel.features_rest], axis=1
                ),
                camera, cvm, ccp, 3, tight_culling=True,
                active_mask=cmodel.active,
            )
            inst = _bi(prep, cgx, cgy, 1 << 22, tile_cull=True)
            return jnp.sum(inst.counts)

        conv_depth = int(_conv_count()) / (cgx * cgy)

    # composited depth for the roofline bound — ONE extra compiled program
    # (compile time matters: the tunneled chip's remote-compile service can
    # be minutes/program, see BENCH.md round-2 infrastructure findings)
    from omnigs_tpu.ops.binning import bin_instances
    from omnigs_tpu.ops.preprocess import preprocess, tile_grid
    from omnigs_tpu.utils.profiling import roofline_report

    gx, gy = tile_grid(camera)
    m = model

    @jax.jit
    def composited_count():
        prep = preprocess(
            m.xyz,
            jnp.exp(m.scaling),
            m.rotation / jnp.linalg.norm(m.rotation, axis=-1, keepdims=True),
            jax.nn.sigmoid(m.opacity[:, 0]),
            jnp.concatenate([m.features_dc, m.features_rest], axis=1),
            camera, vm, campos, 3, tight_culling=True,
        )
        inst = bin_instances(prep, gx, gy, cfg.max_instances, tile_cull=True)
        return jnp.sum(inst.counts)

    live = int(composited_count())
    mean_depth = live / (gx * gy)
    roof = roofline_report(W * H, dt, mean_depth, num_instances=live)

    baseline = 8.3e7  # 3090-class fwd+bwd px/s; derivation in BASELINE.md
    out = {
        "metric": "pixels_per_s_fwdbwd_1920x960",
        "value": round(pixels_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pixels_per_s / baseline, 4),
        "protocol_loss_px_s": round(proto_pixels_per_s, 1),
        "mean_instances_per_tile": round(mean_depth, 1),
        "fraction_of_roofline": round(roof["fraction_of_roofline"], 4),
    }
    if converged_px_s is not None:
        out["converged_scene_px_s"] = round(converged_px_s, 1)
        out["converged_instances_per_tile"] = round(conv_depth, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
