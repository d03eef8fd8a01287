"""Sharded rendering + training step over a (data, gauss) mesh.

The multi-chip execution scheme (SURVEY.md §2.11 / §7.1 M4; no reference
analog — the reference is single-GPU):

  per device (shard_map over the mesh):
    1. preprocess its **Gaussian shard** (P/n_gauss rows of the model);
    2. all_gather the compact rasterization state (means2d, conic, rgb,
       opacity, depth, rect ≈ 20 floats/Gaussian) over the ``gauss`` axis —
       this is the instance-exchange collective, riding ICI;
    3. bin + composite its **tile window** (T/n_gauss tiles) — binning sort
       and compositing FLOPs shard perfectly;
    4. all_gather tile colors to assemble the full image (needed because
       SSIM's 11×11 conv crosses tile boundaries), compute the loss against
       its **view shard** (data axis);
    5. reverse-mode AD re-materializes the backward through the same
       collectives (all_gather ⊤→ psum_scatter), so per-Gaussian gradients
       arrive pre-reduced on the owning shard;
    6. psum gradients over ``data`` (view parallelism), Adam on the local
       shard — moments never leave the device.

All collectives are XLA primitives inside shard_map, so the compiler
overlaps the gradient all-reduce with remaining backward compute.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from omnigs_tpu.cameras import Camera
from omnigs_tpu.model import densify as densify_ops
from omnigs_tpu.model import optimizer as opt_ops
from omnigs_tpu.model.gaussians import GaussianModel
from omnigs_tpu.ops import loss as loss_ops
from omnigs_tpu.ops.binning import bin_gaussians
from omnigs_tpu.ops.preprocess import TILE, preprocess, tile_grid
from omnigs_tpu.ops.rasterize import (
    RasterConfig,
    _composite_tiles,
    _tiles_to_image,
    tile_window_pixel_coords,
)
from omnigs_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS


def _render_image_sharded(
    model_shard: GaussianModel,
    viewmatrix,
    campos,
    camera: Camera,
    bg,
    sh_degree: int,
    cfg: RasterConfig,
    n_gauss: int,
    means2d_ndc=None,
):
    """Device-local piece of the sharded forward. Runs inside shard_map."""
    gx, gy = tile_grid(camera)
    num_tiles = gx * gy
    tiles_per_dev = -(-num_tiles // n_gauss)

    prep = preprocess(
        model_shard.xyz,
        model_shard.get_scaling(),
        model_shard.get_rotation(),
        model_shard.get_opacity(),
        model_shard.get_features(),
        camera,
        viewmatrix,
        campos,
        sh_degree,
        active_mask=model_shard.active,
    )
    means2d = prep.means2d
    if means2d_ndc is not None:
        means2d = means2d + means2d_ndc * jnp.array(
            [camera.width * 0.5, camera.height * 0.5]
        )
    prep = prep._replace(means2d=means2d)

    # instance exchange: compact state of ALL Gaussians on every device
    prep_full = jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, GAUSS_AXIS, tiled=True), prep
    )

    idx = jax.lax.axis_index(GAUSS_AXIS)
    tile_lo = idx * tiles_per_dev
    prep_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, prep_full)
    if cfg.backend == "pallas":
        # production path: compact binning of this device's tile window +
        # the Pallas compositing kernels (interpret=True for the CPU-mesh
        # dryrun/tests; compiled Mosaic on real chips). Knob parity with
        # rasterize.py: depth-presorted packed-key binning and the
        # gather-reduce demotion rule apply per tile window too
        # (VERDICT r4 next-round #4).
        from omnigs_tpu.ops.binning import (
            RANK_BITS,
            bin_instances,
            bin_instances_packed,
        )
        from omnigs_tpu.ops.pallas_raster import composite_instances
        from omnigs_tpu.ops.rasterize import GATHER_REDUCE_MAX_R

        gather_reduce = (
            cfg.gather_reduce
            and cfg.max_instances <= GATHER_REDUCE_MAX_R
        )
        packable = (
            cfg.depth_presort
            and not cfg.ghost_align
            and prep_full.depths.shape[0] <= (1 << RANK_BITS)
            and gx * gy < (1 << (32 - RANK_BITS)) - 1
        )
        if cfg.segmented:
            # segmented-chunk kernels per device tile window — the
            # multi-chip path inherits the round-5 single-chip win; the
            # relay and kernels are window-agnostic except for tile_lo
            # restoring global tile coordinates (gather_reduce demoted
            # like rasterize.py — measured loser under segmented)
            gather_reduce = False
        bin_fn = bin_instances_packed if packable else bin_instances
        inst = bin_fn(
            prep_sg, gx, gy, cfg.max_instances,
            tile_lo=tile_lo, n_tiles=tiles_per_dev,
            tile_cull=cfg.tile_culling,
            with_emission=gather_reduce,
        )
        if cfg.segmented:
            from omnigs_tpu.ops.binning import segment_relay
            from omnigs_tpu.ops.pallas_raster import CHUNK as PCHUNK
            from omnigs_tpu.ops.pallas_seg import composite_instances_seg

            p_gauss = prep_full.depths.shape[0]
            r8 = cfg.aligned_cap
            if r8 is None:
                r8 = -(-cfg.max_instances // PCHUNK) * PCHUNK
            seg = segment_relay(
                inst.sorted_g, inst.sorted_e, inst.starts, inst.counts,
                r8, p_gauss, sorted_key=inst.sorted_key,
            )
            color_t, T_t, n_t = composite_instances_seg(
                prep_full.means2d,
                prep_full.conic,
                prep_full.rgb,
                prep_full.opacity,
                bg,
                seg.sorted_g8,
                seg.starts8,
                seg.counts,
                seg.live8,
                seg.ride_d,
                seg.ride_t,
                seg.e8,
                inst.seg_lo,
                inst.seg_hi,
                inst.perm,
                inst.inv_perm,
                jnp.asarray(tile_lo, jnp.int32),
                tiles_per_dev,
                gx,
                cfg.interpret,
            )
            all_tiles = jax.lax.all_gather(color_t, GAUSS_AXIS, tiled=True)
            num_tiles_g = gx * gy
            image = _tiles_to_image(
                all_tiles[:num_tiles_g], gx, gy, camera.width, camera.height
            )
            return (
                image,
                prep_full.radii,
                jnp.zeros((), jnp.int32),
                inst.truncated + seg.truncated,
            )
        sorted_g, starts, counts = inst.sorted_g, inst.starts, inst.counts
        overflow = jnp.zeros((), jnp.int32)
        truncated = inst.truncated
        cap = cfg.aligned_cap
        if cap is not None and cap < sorted_g.shape[0]:
            fits = starts + counts <= cap
            # cap-trimmed tiles are dropped deterministically — counted,
            # never silent (binning contract; ADVICE r1)
            truncated = truncated + jnp.sum(jnp.where(fits, 0, counts))
            counts = jnp.where(fits, counts, 0)
            starts = jnp.clip(starts, 0, cap - 1)
            sorted_g = sorted_g[:cap]
        t = tile_lo + jnp.arange(tiles_per_dev, dtype=jnp.int32)
        x0 = (t % gx) * TILE
        y0 = (t // gx) * TILE
        color_t, T_t, n_t = composite_instances(
            prep_full.means2d,
            prep_full.conic,
            prep_full.rgb,
            prep_full.opacity,
            bg,
            sorted_g,
            starts,
            counts,
            x0,
            y0,
            inst.sorted_e,
            inst.seg_lo,
            inst.seg_hi,
            inst.perm,
            inst.inv_perm,
            tiles_per_dev,
            cfg.interpret,
            cfg.want_ncontrib,
            cfg.fused_reduce,
        )
        tiles_cmajor = color_t  # already (T_w, 3, PX)
    else:
        binned = bin_gaussians(
            prep_sg,
            gx,
            gy,
            cfg.max_instances,
            cfg.tile_cap,
            tile_lo=tile_lo,
            n_tiles=tiles_per_dev,
        )
        pix = tile_window_pixel_coords(tile_lo, tiles_per_dev, gx)
        color_t, T_t, n_t = _composite_tiles(
            prep_full.means2d,
            prep_full.conic,
            prep_full.rgb,
            prep_full.opacity,
            bg,
            binned.tile_ids,
            binned.tile_mask,
            pix,
            cfg.chunk,
        )
        tiles_cmajor = jnp.swapaxes(color_t, 1, 2)
        overflow = binned.overflow
        truncated = binned.truncated
    # assemble the full image (SSIM needs cross-tile context);
    # channels-first per the framework convention
    all_tiles = jax.lax.all_gather(tiles_cmajor, GAUSS_AXIS, tiled=True)
    image = _tiles_to_image(
        all_tiles[:num_tiles], gx, gy, camera.width, camera.height
    )
    return image, prep_full.radii, overflow, truncated


def sharded_render(
    mesh,
    model: GaussianModel,
    viewmatrix,
    campos,
    camera: Camera,
    bg,
    sh_degree: int,
    cfg: RasterConfig,
):
    """Forward-only sharded render (evaluation / viewer path)."""
    n_gauss = mesh.shape[GAUSS_AXIS]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P(GAUSS_AXIS), model),
            P(),
            P(),
            P(),
        ),
        out_specs=P(),
        check_vma=False,
    )
    def fwd(model_shard, vm, cp, bgc):
        img, _, _, _ = _render_image_sharded(
            model_shard, vm, cp, camera, bgc, sh_degree, cfg, n_gauss
        )
        return img

    return fwd(model, viewmatrix, campos, bg)


def _sharded_iteration(
    model_shard,
    opt_shard,
    vms,
    cps,
    gts,
    it,
    *,
    camera,
    sh_degree,
    cfg,
    lr_cfg,
    spatial_lr_scale,
    bg_const,
    lambda_dssim,
    skip_bottom_px,
    update_stats,
    do_adam,
    n_gauss,
):
    """One training iteration on one device's shards — runs inside
    shard_map; shared by the per-step and fused-window builders."""
    def view_loss(m, vm, cp, gt, ndc):
        """One view's loss with ROW-PARTITIONED partials: each gauss
        shard convolves only its own row block of the assembled
        image (loss_ops.ssim_rows + an L1 row-slice), then the
        partial sums psum over the gauss axis. Per-device loss FLOPs
        scale with H/n_gauss instead of the full image; the 11-px
        SSIM halo comes from the already-gathered image rows."""
        image, radii, overflow, truncated = _render_image_sharded(
            m, vm, cp, camera, bg_const, sh_degree, cfg, n_gauss,
            means2d_ndc=ndc,
        )
        pred, gtc = image, gt  # (3, H, W)
        if skip_bottom_px > 0:
            pred = pred[:, :-skip_bottom_px]
            gtc = gtc[:, :-skip_bottom_px]
        c, H2, W = pred.shape
        rows_per = -(-H2 // n_gauss)
        r0 = jax.lax.axis_index(GAUSS_AXIS) * rows_per
        row_valid = (
            r0 + jnp.arange(rows_per, dtype=jnp.int32) < H2
        )[None, :, None]

        def rows_of(x):
            p = jnp.pad(x, ((0, 0), (0, rows_per), (0, 0)))
            return jax.lax.dynamic_slice_in_dim(
                p, r0, rows_per, axis=1
            )

        l1_part = jnp.sum(
            jnp.where(
                row_valid,
                jnp.abs(rows_of(pred) - rows_of(gtc)),
                0.0,
            )
        )
        smap = loss_ops.ssim_rows(pred, gtc, r0, rows_per, H2)
        ssim_part = jnp.sum(jnp.where(row_valid, smap, 0.0))
        npix = c * H2 * W
        l1 = jax.lax.psum(l1_part, GAUSS_AXIS) / npix
        ssim_mean = jax.lax.psum(ssim_part, GAUSS_AXIS) / npix
        total = (1.0 - lambda_dssim) * l1 + lambda_dssim * (
            1.0 - ssim_mean
        )
        return total, (radii, overflow, truncated)

    n_views = vms.shape[0]  # views per data group (batched DP)

    def loss_fn(params, ndc):
        m = model_shard.with_params(params)
        total = 0.0
        radii_v, ov_t, tr_t = [], 0, 0
        for v in range(n_views):
            t, (radii, ov, tr) = view_loss(
                m, vms[v], cps[v], gts[v], ndc[v]
            )
            total = total + t
            radii_v.append(radii)
            ov_t, tr_t = ov_t + ov, tr_t + tr
        return total / n_views, (
            jnp.stack(radii_v), ov_t, tr_t
        )

    params = model_shard.params()
    # per-view ndc rows so densify stats sum ‖grad_v‖ per view
    # (reference accumulates per iteration, one view each)
    ndc0 = jnp.zeros((n_views, model_shard.capacity, 2))
    (loss, (radii_views, overflow, truncated)), (grads, ndc_g) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            params, ndc0
        )
    )
    # view-parallel gradient all-reduce (overlapped by XLA)
    grads = jax.lax.pmean(grads, DATA_AXIS)
    loss_mean = jax.lax.pmean(loss, DATA_AXIS)
    # capacity-pressure counters, totalled over the whole mesh
    # (each gauss shard bins its own tile window; data groups see
    # different views)
    overflow = jax.lax.psum(
        jax.lax.psum(overflow, GAUSS_AXIS), DATA_AXIS
    )
    truncated = jax.lax.psum(
        jax.lax.psum(truncated, GAUSS_AXIS), DATA_AXIS
    )

    model_new = model_shard
    if update_stats:
        # per-view stat accumulation summed over the view batch
        # (`addDensificationStats`: Σ_views ‖ndc grad‖ per Gaussian)
        p_loc = model_shard.capacity
        lo = jax.lax.axis_index(GAUSS_AXIS) * p_loc
        radii_loc = jax.lax.dynamic_slice_in_dim(
            radii_views, lo, p_loc, axis=1
        )  # (V, p_loc)
        vis = radii_loc > 0
        gnorm = jnp.linalg.norm(ndc_g[..., :2], axis=-1)  # (V, p_loc)
        model_new = model_new.replace(
            xyz_gradient_accum=model_new.xyz_gradient_accum
            + jax.lax.psum(
                jnp.sum(jnp.where(vis, gnorm, 0.0), axis=0),
                DATA_AXIS,
            ),
            denom=model_new.denom
            + jax.lax.psum(
                jnp.sum(vis.astype(jnp.float32), axis=0), DATA_AXIS
            ),
            max_radii2d=jnp.maximum(
                model_new.max_radii2d,
                jax.lax.pmax(jnp.max(radii_loc, axis=0), DATA_AXIS),
            ),
        )

    opt_new = opt_shard
    if do_adam:
        lrs = opt_ops.group_lrs(lr_cfg, spatial_lr_scale, it)
        new_params, opt_new = opt_ops.adam_step(
            model_new.params(),
            grads,
            opt_shard,
            lrs,
            model_new.active,
        )
        model_new = model_new.with_params(new_params)
    aux = dict(
        loss=loss_mean, overflow=overflow, truncated=truncated
    )
    return model_new, opt_new, aux


def make_sharded_train_step(
    mesh,
    camera: Camera,
    sh_degree: int,
    cfg: RasterConfig,
    lr_cfg: opt_ops.LRConfig,
    spatial_lr_scale: float,
    bg=None,
    lambda_dssim: float = 0.2,
    skip_bottom_px: int = 0,
    update_stats: bool = True,
    do_adam: bool = True,
):
    """Build the jitted multi-device training step.

    Views are sharded over ``data`` (one view per data group per step —
    batched view parallelism); the model/optimizer shard over ``gauss``.
    """
    n_gauss = mesh.shape[GAUSS_AXIS]
    bg_const = jnp.zeros(3) if bg is None else jnp.asarray(bg)

    def step(model, opt_state, viewmatrices, camposes, gt_images, it):
        gauss_spec_model = jax.tree_util.tree_map(
            lambda _: P(GAUSS_AXIS), model
        )
        gauss_spec_opt = jax.tree_util.tree_map(
            lambda _: P(GAUSS_AXIS), opt_state
        )
        gauss_spec_opt = gauss_spec_opt.replace(count=P())

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                gauss_spec_model,
                gauss_spec_opt,
                P(DATA_AXIS),
                P(DATA_AXIS),
                P(DATA_AXIS),
                P(),
            ),
            out_specs=(gauss_spec_model, gauss_spec_opt, P()),
            check_vma=False,
        )
        def _step(model_shard, opt_shard, vms, cps, gts, it):
            return _sharded_iteration(
                model_shard, opt_shard, vms, cps, gts, it,
                camera=camera, sh_degree=sh_degree, cfg=cfg, lr_cfg=lr_cfg,
                spatial_lr_scale=spatial_lr_scale, bg_const=bg_const,
                lambda_dssim=lambda_dssim, skip_bottom_px=skip_bottom_px,
                update_stats=update_stats, do_adam=do_adam, n_gauss=n_gauss,
            )

        return _step(model, opt_state, viewmatrices, camposes, gt_images, it)

    return jax.jit(step)


def make_sharded_densify(mesh, **static_kwargs):
    """Per-shard densification: each gauss shard allocates into its own free
    slots (slot placement is an implementation detail; thresholds are
    elementwise so semantics match the global op)."""

    def run(model, opt_state, key, iteration):
        gauss_spec_model = jax.tree_util.tree_map(lambda _: P(GAUSS_AXIS), model)
        gauss_spec_opt = jax.tree_util.tree_map(
            lambda _: P(GAUSS_AXIS), opt_state
        ).replace(count=P())

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(gauss_spec_model, gauss_spec_opt, P(), P()),
            out_specs=(gauss_spec_model, gauss_spec_opt, P()),
            check_vma=False,
        )
        def _run(m, o, k, it):
            k = jax.random.fold_in(k, jax.lax.axis_index(GAUSS_AXIS))
            m2, o2, stats = densify_ops.densify_and_prune(
                m, o, k, iteration=it, **static_kwargs
            )
            stats = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, GAUSS_AXIS), stats
            )
            return m2, o2, stats

        return _run(model, opt_state, key, iteration)

    return jax.jit(run)


def make_sharded_train_window(
    mesh,
    camera: Camera,
    sh_degree: int,
    cfg: RasterConfig,
    lr_cfg: opt_ops.LRConfig,
    spatial_lr_scale: float,
    bg=None,
    lambda_dssim: float = 0.2,
    skip_bottom_px: int = 0,
    update_stats: bool = True,
):
    """K iterations scanned into ONE device program over the mesh — the
    sharded analog of `train_steps_fused` (the per-dispatch host round trip
    dominates on tunneled devices; windows end strictly before densify/
    reset/SH-bump events, so `do_adam=True` holds throughout).

    Inputs carry a leading K axis: viewmatrices (K, D, 4, 4), camposes
    (K, D, 3), gt_images (K, D, 3, H, W) with D = n_data·views_per_group.
    """
    n_gauss = mesh.shape[GAUSS_AXIS]
    bg_const = jnp.zeros(3) if bg is None else jnp.asarray(bg)

    def window(model, opt_state, viewmatrices, camposes, gt_images, it0):
        gauss_spec_model = jax.tree_util.tree_map(
            lambda _: P(GAUSS_AXIS), model
        )
        gauss_spec_opt = jax.tree_util.tree_map(
            lambda _: P(GAUSS_AXIS), opt_state
        ).replace(count=P())

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                gauss_spec_model,
                gauss_spec_opt,
                P(None, DATA_AXIS),
                P(None, DATA_AXIS),
                P(None, DATA_AXIS),
                P(),
            ),
            out_specs=(gauss_spec_model, gauss_spec_opt, P()),
            check_vma=False,
        )
        def _window(m, o, vms, cps, gts, it0):
            k = vms.shape[0]
            its = it0 + jnp.arange(1, k + 1)

            def body(carry, xs):
                m, o = carry
                vm, cp, gt, it = xs
                m, o, aux = _sharded_iteration(
                    m, o, vm, cp, gt, it,
                    camera=camera, sh_degree=sh_degree, cfg=cfg,
                    lr_cfg=lr_cfg, spatial_lr_scale=spatial_lr_scale,
                    bg_const=bg_const, lambda_dssim=lambda_dssim,
                    skip_bottom_px=skip_bottom_px,
                    update_stats=update_stats, do_adam=True,
                    n_gauss=n_gauss,
                )
                return (m, o), (
                    aux["loss"], aux["overflow"], aux["truncated"]
                )

            (m, o), (losses, ov, tr) = jax.lax.scan(
                body, (m, o), (vms, cps, gts, its)
            )
            return m, o, (losses, jnp.sum(ov), jnp.sum(tr))

        return _window(
            model, opt_state, viewmatrices, camposes, gt_images, it0
        )

    return jax.jit(window)
