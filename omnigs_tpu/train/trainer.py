"""Training orchestration — the `GaussianMapper` analog.

Replicates the reference's training driver semantics
(`/root/reference/src/gaussian_mapper.cpp:220-490`) on top of jitted steps:

* per-iteration: random keyframe with times-of-use budget, SH degree bump
  every 1000 iters, log-lerp xyz LR, render → masked/skip-bottom-cropped
  0.8·L1 + 0.2·(1−SSIM), backward, densification-stat accumulation, Adam.
* densify/prune every `densification_interval` in
  (densify_from, densify_until), opacity reset every
  `opacity_reset_interval`.
* Quirk parity: in the reference, `densifyAndPrune`/`resetOpacity` replace
  the param tensors *before* `optimizer_->step()`, so the fresh tensors have
  no grads and torch silently skips their update that iteration
  (`gaussian_mapper.cpp:436-451,484-488`). Reproduced here with static
  `do_adam` / `skip_opacity_update` flags on the jitted step.

The jitted step itself is pure; the loop is host-side Python exactly like
the reference's C++ loop (one iteration ≙ one XLA invocation).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import Camera
from omnigs_tpu.config import Config
from omnigs_tpu.model import densify as densify_ops
from omnigs_tpu.model import optimizer as opt_ops
from omnigs_tpu.model.gaussians import GaussianModel, from_pcd
from omnigs_tpu.ops import loss as loss_ops
from omnigs_tpu.ops.knn import mean_sq_knn_dist
from omnigs_tpu.ops.rasterize import RasterConfig
from omnigs_tpu.scene.scene import KeyframeSampler, Scene
from omnigs_tpu.train.renderer import render_model


@functools.partial(
    jax.jit,
    static_argnames=(
        "camera",
        "sh_degree",
        "raster_cfg",
        "lr_cfg",
        "spatial_lr_scale",
        "lambda_dssim",
        "skip_bottom_px",
        "update_stats",
        "do_adam",
        "skip_opacity_update",
    ),
    donate_argnames=("model", "opt_state"),
)
def train_step(
    model: GaussianModel,
    opt_state: opt_ops.AdamState,
    viewmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    gt_image: jnp.ndarray,
    step: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    camera: Camera,
    sh_degree: int,
    raster_cfg: RasterConfig,
    lr_cfg: opt_ops.LRConfig,
    spatial_lr_scale: float,
    bg: jnp.ndarray,
    lambda_dssim: float = 0.2,
    skip_bottom_px: int = 0,
    update_stats: bool = True,
    do_adam: bool = True,
    skip_opacity_update: bool = False,
):
    """One train iteration: render → loss → backward → stats → Adam."""
    params = model.params()
    ndc_zeros = jnp.zeros((model.capacity, 2))

    def loss_fn(p: Dict[str, jnp.ndarray], ndc):
        m = model.with_params(p)
        res = render_model(
            m,
            camera,
            viewmatrix,
            campos,
            bg,
            sh_degree,
            raster_cfg,
            means2d_ndc=ndc,
        )
        pred = res.image  # (3, H, W)
        if mask is not None:
            # undistort-mask multiply on the RENDERED image only — the GT is
            # already undistorted/masked at load (`gaussian_mapper.cpp:391`)
            pred = pred * mask
        gt = gt_image
        if skip_bottom_px > 0:
            pred = pred[:, :-skip_bottom_px]
            gt = gt[:, :-skip_bottom_px]
        l1 = loss_ops.l1_loss(pred, gt)
        total = (1.0 - lambda_dssim) * l1 + lambda_dssim * (
            1.0 - loss_ops.ssim(pred, gt)
        )
        return total, (l1, res.radii, res.image, res.overflow, res.truncated)

    (loss, (l1, radii, image, overflow, truncated)), (grads, ndc_grads) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            params, ndc_zeros
        )
    )

    if update_stats:
        model = densify_ops.add_densification_stats(model, ndc_grads, radii)

    if do_adam:
        lrs = opt_ops.group_lrs(lr_cfg, spatial_lr_scale, step)
        if skip_opacity_update:
            lrs = dict(lrs)
            lrs["opacity"] = jnp.zeros(())
        new_params, opt_state = opt_ops.adam_step(
            model.params(), grads, opt_state, lrs, model.active
        )
        model = model.with_params(new_params)

    aux = dict(
        loss=loss,
        l1=l1,
        radii=radii,
        image=image,
        overflow=overflow,
        truncated=truncated,
    )
    return model, opt_state, aux


@functools.partial(
    jax.jit,
    static_argnames=(
        "camera",
        "sh_degree",
        "raster_cfg",
        "lr_cfg",
        "spatial_lr_scale",
        "lambda_dssim",
        "skip_bottom_px",
        "update_stats",
    ),
    donate_argnames=("model", "opt_state"),
)
def train_steps_fused(
    model: GaussianModel,
    opt_state: opt_ops.AdamState,
    viewmatrices: jnp.ndarray,  # (K, 4, 4)
    camposes: jnp.ndarray,  # (K, 3)
    gt_images: jnp.ndarray,  # (K, 3, H, W)
    step0: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # (H, W) — single-camera fused path
    *,
    camera: Camera,
    sh_degree: int,
    raster_cfg: RasterConfig,
    lr_cfg: opt_ops.LRConfig,
    spatial_lr_scale: float,
    bg: jnp.ndarray,
    lambda_dssim: float = 0.2,
    skip_bottom_px: int = 0,
    update_stats: bool = True,
):
    """K train iterations fused into ONE device program via `lax.scan`.

    TPU-idiomatic: the reference's C++ loop dispatches one iteration at a
    time (free on a local GPU); here the host round-trip per dispatch is the
    bottleneck, so the trainer scans whole windows between densify/reset/
    SH-bump events (those steps run via `train_step`, which carries the
    event flags). Inside a window `do_adam=True` and
    `skip_opacity_update=False` always hold — windows end strictly before
    event iterations."""
    k = viewmatrices.shape[0]
    its = step0 + jnp.arange(1, k + 1)

    def body(carry, xs):
        m, o = carry
        vm, cp, gt, it = xs
        m, o, aux = train_step.__wrapped__(
            m,
            o,
            vm,
            cp,
            gt,
            it,
            mask,
            camera=camera,
            sh_degree=sh_degree,
            raster_cfg=raster_cfg,
            lr_cfg=lr_cfg,
            spatial_lr_scale=spatial_lr_scale,
            bg=bg,
            lambda_dssim=lambda_dssim,
            skip_bottom_px=skip_bottom_px,
            update_stats=update_stats,
            do_adam=True,
            skip_opacity_update=False,
        )
        return (m, o), (aux["loss"], aux["overflow"], aux["truncated"])

    (model, opt_state), (losses, overflow, truncated) = jax.lax.scan(
        body, (model, opt_state), (viewmatrices, camposes, gt_images, its)
    )
    return model, opt_state, (losses, jnp.sum(overflow), jnp.sum(truncated))


densify_and_prune_jit = jax.jit(
    densify_ops.densify_and_prune,
    static_argnames=(
        "max_grad",
        "min_opacity",
        "max_screen_size",
        "percent_dense",
        "prune_by_extent",
    ),
)
reset_opacity_jit = jax.jit(densify_ops.reset_opacity)


@dataclasses.dataclass
class Trainer:
    scene: Scene
    config: Config
    output_dir: Optional[Path] = None
    seed: int = 0

    def __post_init__(self):
        cfg = self.config
        if self.scene.cameras:
            self.camera: Camera = next(iter(self.scene.cameras.values()))
        else:
            self.camera = next(iter(self.scene.keyframes.values())).camera
        _, self.cameras_extent = self.scene.nerfpp_norm()
        from omnigs_tpu.config import raster_config_from

        self.raster_cfg = raster_config_from(cfg)
        self.lr_cfg = opt_ops.LRConfig(
            position_lr_init=cfg.opt.position_lr_init,
            position_lr_final=cfg.opt.position_lr_final,
            position_lr_delay_mult=cfg.opt.position_lr_delay_mult,
            position_lr_max_steps=cfg.opt.position_lr_max_steps,
            feature_lr=cfg.opt.feature_lr,
            opacity_lr=cfg.opt.opacity_lr,
            scaling_lr=cfg.opt.scaling_lr,
            rotation_lr=cfg.opt.rotation_lr,
        )
        self.bg = (
            jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
        )
        self.sampler = KeyframeSampler(
            self.scene, cfg.mapper.new_keyframe_times_of_use, self.seed
        )
        self.iteration = 0
        self.ema_loss = 0.0
        self.last_loss = 0.0
        # capacity-pressure counters — "counted, never silent" (binning
        # contract): instances dropped by max_instances / aligned_cap
        self.total_overflow = 0
        self.total_truncated = 0
        self._pending_losses = []
        from omnigs_tpu.utils.profiling import PeakMemoryTracker

        self.peak_memory = PeakMemoryTracker()
        self._it_dev = None
        self.key = jax.random.PRNGKey(self.seed)
        self.model: Optional[GaussianModel] = None
        self.opt_state: Optional[opt_ops.AdamState] = None
        self._gt_cache: Dict[int, jnp.ndarray] = {}
        # device-resident undistort masks per (camera, level width)
        self._mask_cache: Dict[tuple, Optional[jnp.ndarray]] = {}
        # device-resident pose tensors per keyframe: re-uploading the same
        # 16 floats every iteration costs a host→device round trip per step
        # (expensive on remote/tunneled devices)
        self._pose_cache: Dict[int, tuple] = {}
        self.history = []

    # -- setup (`trainSfmPcd`, `gaussian_mapper.cpp:220-289`) --

    def init_from_sfm(self):
        pts = jnp.asarray(self.scene.points)
        cols = jnp.asarray(self.scene.colors)
        d2 = mean_sq_knn_dist(pts)
        self.model = from_pcd(pts, cols, self.config.tpu.capacity, d2)
        self.opt_state = opt_ops.init_adam(self.model.params())
        if self.config.tpu.max_instances == 0:
            self._autosize_capacities()

    def _autosize_capacities(self, sample_views: int = 4):
        """Size `max_instances` from measured scene statistics
        (Tpu.max_instances: 0 = auto): surviving instance emission over a
        few sampled views, scaled by the densification growth headroom
        (emission grows ~linearly with live Gaussians up to capacity) plus
        25% margin, rounded to a power of two. Complements the truncation
        counters: overflow is still counted and warned if the estimate is
        ever exceeded mid-training."""
        import math

        from omnigs_tpu.ops.binning import _precull_masks
        from omnigs_tpu.ops.preprocess import preprocess, tile_grid

        fids = sorted(self.scene.keyframes)
        step = max(len(fids) // sample_views, 1)
        worst = 0

        @jax.jit
        def emission(vm, campos, camera=self.camera):
            prep = preprocess(
                self.model.xyz,
                self.model.get_scaling(),
                self.model.get_rotation(),
                self.model.get_opacity(),
                self.model.get_features(),
                camera,
                vm,
                campos,
                0,
                active_mask=self.model.active,
                tight_culling=self.raster_cfg.tight_culling,
            )
            if self.raster_cfg.tile_culling:
                _, _, tiles = _precull_masks(prep, tile_grid(camera)[0])
            else:
                tiles = prep.tiles_touched
            return jnp.sum(tiles)

        for fid in fids[::step][:sample_views]:
            kf = self.scene.keyframes[fid]
            worst = max(
                worst,
                int(emission(jnp.asarray(kf.viewmatrix), jnp.asarray(kf.campos))),
            )
        growth = self.config.tpu.capacity / max(int(self.model.num_active), 1)
        est = int(worst * min(growth, 8.0) * 1.25)
        max_inst = 1 << max(16, math.ceil(math.log2(max(est, 1))))
        max_inst = min(max_inst, 1 << 23)  # offsets ride an f32 column
        self.config.tpu.max_instances = max_inst
        cap8 = None
        if self.config.tpu.aligned_cap == 0 and (
            self.raster_cfg.backend == "pallas"
        ):
            # live-slab cap (= the segmented layout's slab8 capacity):
            # estimated survivors + the 8-granular padding bound, rounded
            # UP to a 2^16 multiple so the relay/build live-bound loops
            # engage. Everything downstream of binning scales with this
            # instead of the pow2-rounded emission budget (BENCH.md r5:
            # the cap retune alone was +4.5 Mpix/s at the bench workload);
            # overshoot is impossible to silence — trimmed tiles are
            # counted in `truncated` and warned like max_instances.
            from omnigs_tpu.ops.preprocess import tile_grid as _tg

            gx_, gy_ = _tg(self.camera)
            cap8 = est + 8 * gx_ * gy_
            cap8 = min(-(-cap8 // (1 << 16)) * (1 << 16), max_inst)
            self.config.tpu.aligned_cap = cap8
        from omnigs_tpu.config import raster_config_from

        self.raster_cfg = raster_config_from(self.config)
        print(
            f"[autosize] max_instances={max_inst} aligned_cap={cap8} "
            f"(measured worst emission {worst}, growth cap "
            f"{min(growth, 8.0):.1f}x)",
            flush=True,
        )

    @property
    def sh_degree(self) -> int:
        """+1 every 1000 iterations up to the max (`gaussian_mapper.cpp:332-337`)."""
        return min(self.iteration // 1000, self.config.model.sh_degree)

    def _gt(self, kf, level_camera=None) -> jnp.ndarray:
        key = (kf.fid, None if level_camera is None else level_camera.width)
        if key not in self._gt_cache:
            img = kf.image
            if level_camera is not None and (
                level_camera.width != kf.camera.width
            ):
                import cv2

                img = cv2.resize(
                    np.asarray(img),
                    (level_camera.width, level_camera.height),
                    interpolation=cv2.INTER_AREA,
                )
            # loaders produce HWC; the framework's image convention is
            # channels-first (TPU lane-padding: see ops/loss.py)
            self._gt_cache[key] = jnp.asarray(img).transpose(2, 0, 1)
        return self._gt_cache[key]

    def _mask(self, camera, level_camera=None) -> Optional[jnp.ndarray]:
        """Device (H, W) undistort mask for this camera (and pyramid level),
        or None. Per-level masks mirror `gaus_pyramid_undistort_mask_`
        (`include/camera.h:96-108`)."""
        lc = level_camera or camera
        key = (camera, lc.width, lc.height)
        if key not in self._mask_cache:
            m = self.scene.undistort_mask(camera)
            if m is None:
                self._mask_cache[key] = None
            else:
                if (lc.width, lc.height) != (camera.width, camera.height):
                    import cv2

                    m = cv2.resize(np.asarray(m), (lc.width, lc.height))
                self._mask_cache[key] = jnp.asarray(m)
        return self._mask_cache[key]

    # -- the loop --

    def train_iteration(self):
        cfg = self.config
        self.iteration += 1
        it = self.iteration
        kf = self.sampler.sample()

        in_densify_phase = it < cfg.opt.densify_until_iter
        do_densify = (
            in_densify_phase
            and it > cfg.opt.densify_from_iter
            and it % cfg.opt.densification_interval == 0
        )
        do_reset = in_densify_phase and (
            (
                cfg.opt.opacity_reset_interval
                and it % cfg.opt.opacity_reset_interval == 0
            )
            or (
                cfg.model.white_background
                and it == cfg.opt.densify_from_iter
            )
        )

        # coarse-to-fine pyramid (`trainForOneIteration`,
        # `src/gaussian_mapper.cpp:309-325`)
        camera = kf.camera
        if cfg.pyramid.do and cfg.pyramid.num_sub_levels > 0:
            if kf.pyramid_budgets is None:
                kf.pyramid_budgets = [
                    cfg.pyramid.sub_level_times_of_use
                ] * cfg.pyramid.num_sub_levels
            level = kf.current_pyramid_level(cfg.pyramid.num_sub_levels)
            if level < cfg.pyramid.num_sub_levels:
                f = cfg.pyramid.factor(level)
                camera = dataclasses.replace(
                    camera,
                    width=max(int(camera.width * f), 16),
                    height=max(int(camera.height * f), 16),
                )

        skip_bottom_px = (
            int(round(camera.height * cfg.opt.skip_bottom_ratio))
            if cfg.opt.skip_bottom_ratio > 0
            else 0
        )

        if kf.fid not in self._pose_cache:
            self._pose_cache[kf.fid] = (
                jnp.asarray(kf.viewmatrix),
                jnp.asarray(kf.campos),
            )
        vm_dev, campos_dev = self._pose_cache[kf.fid]
        # device-side step counter: jnp.asarray(it) would be a blocking
        # host→device transfer every iteration (expensive on remote devices)
        if self._it_dev is None:
            self._it_dev = jnp.asarray(it)
        else:
            self._it_dev = self._it_dev + 1
        self.model, self.opt_state, aux = train_step(
            self.model,
            self.opt_state,
            vm_dev,
            campos_dev,
            self._gt(kf, camera),
            self._it_dev,
            self._mask(kf.camera, camera),
            camera=camera,
            sh_degree=self.sh_degree,
            raster_cfg=self.raster_cfg,
            lr_cfg=self.lr_cfg,
            spatial_lr_scale=self.cameras_extent,
            bg=self.bg,
            lambda_dssim=cfg.opt.lambda_dssim,
            skip_bottom_px=skip_bottom_px,
            update_stats=in_densify_phase,
            # reference quirk: replaced tensors skip their Adam update
            do_adam=not do_densify and it < cfg.opt.max_num_iterations,
            skip_opacity_update=do_reset,
        )

        if do_densify:
            size_threshold = (
                20 if it > cfg.opt.prune_big_point_after_iter else 0
            )
            self.key, sub = jax.random.split(self.key)
            self.model, self.opt_state, dstats = densify_and_prune_jit(
                self.model,
                self.opt_state,
                sub,
                max_grad=cfg.opt.densify_grad_threshold,
                min_opacity=cfg.opt.densify_min_opacity,
                extent=self.cameras_extent,
                max_screen_size=size_threshold,
                percent_dense=cfg.opt.percent_dense,
                prune_by_extent=cfg.opt.prune_by_extent,
                iteration=it,
            )

        if do_reset:
            self.model, self.opt_state = reset_opacity_jit(
                self.model, self.opt_state
            )

        if do_densify or do_reset:
            # the allocation spikes live here (model/optimizer arrays are
            # rebuilt) — sample for the across-run peak report
            self.peak_memory.sample()

        # Defer the loss fetch: float(loss) here would force a device→host
        # sync EVERY iteration (the reference's per-iter
        # `torch::cuda::synchronize`, gaussian_mapper.cpp:416 — cheap on a
        # local GPU, 100+ ms on a tunneled device). The EMA folds in lazily
        # at the next log/record point; steps stay async-dispatched.
        self._pending_losses.append(
            (aux["loss"], aux["overflow"], aux["truncated"])
        )
        if len(self._pending_losses) > 512:
            self.drain_losses()
        return aux

    def drain_losses(self) -> float:
        """Fold queued device-side losses into the host EMA (0.4/0.6 like
        `gaussian_mapper.cpp:420`) and total the capacity-pressure counters;
        returns the most recent loss."""
        if self._pending_losses:
            pend, self._pending_losses = self._pending_losses, []
            for x, ov, tr in pend:
                for v in np.atleast_1d(np.asarray(x)).tolist():
                    self.last_loss = v
                    self.ema_loss = 0.4 * v + 0.6 * self.ema_loss
                self.total_overflow += int(ov)
                self.total_truncated += int(tr)
            if self.total_overflow or self.total_truncated:
                import warnings

                warnings.warn(
                    "capacity pressure: "
                    f"{self.total_truncated} instances truncated / "
                    f"{self.total_overflow} overflowed so far — raise "
                    "Tpu.max_instances / Tpu.aligned_cap",
                    stacklevel=2,
                )
        return self.last_loss

    # -- fused multi-step windows --

    def _next_event_iter(self, it: int) -> int:
        """First iteration > ``it`` that needs the single-step path (densify,
        opacity reset, SH-degree bump, phase boundary, final iteration)."""
        cfg = self.config

        def nxt(m):
            return (it // m + 1) * m

        events = [nxt(1000)]  # SH degree bump cadence
        if cfg.opt.densification_interval:
            events.append(nxt(cfg.opt.densification_interval))
        if cfg.opt.opacity_reset_interval:
            events.append(nxt(cfg.opt.opacity_reset_interval))
        for b in (
            cfg.opt.densify_from_iter,
            cfg.opt.densify_until_iter,
            cfg.opt.max_num_iterations,
        ):
            if b > it:
                events.append(b)
        return min(events)

    def _ensure_banks(self):
        """(V, ...) pose and GT banks for fused windows. Invalidated when the
        keyframe set changes (`increasePcd`-style mid-training inserts). The
        GT bank lives on device only while it fits `Tpu.gt_bank_mb`; above
        that it stays host-side and each window uploads just its sampled
        rows (bounded memory, one extra H2D per window)."""
        fids = sorted(self.scene.keyframes)
        if (
            getattr(self, "_banks", None) is not None
            and self._banks_fids == fids
        ):
            return
        self._banks_fids = fids
        kfs = [self.scene.keyframes[f] for f in fids]
        vms = jnp.asarray(np.stack([k.viewmatrix for k in kfs]))
        cps = jnp.asarray(np.stack([k.campos for k in kfs]))
        c = kfs[0].camera
        gt_bytes = len(kfs) * 3 * c.height * c.width * 4
        if gt_bytes <= self.config.tpu.gt_bank_mb * (1 << 20):
            gts = jnp.stack([self._gt(k) for k in kfs])
        else:
            gts = np.stack([np.asarray(k.image).transpose(2, 0, 1) for k in kfs])
        self._banks = ({f: i for i, f in enumerate(fids)}, vms, cps, gts)

    def train_window(self, max_steps: int) -> int:
        """Run up to ``max_steps`` iterations as ONE scanned device program
        (between event iterations). Returns the number of steps taken —
        0 means the next iteration is an event: call `train_iteration`.
        Falls back to 0 when fusion doesn't apply (pyramid training)."""
        cfg = self.config
        if cfg.pyramid.do and cfg.pyramid.num_sub_levels > 0:
            return 0
        it = self.iteration
        k = min(max_steps, self._next_event_iter(it) - 1 - it)
        if k <= 0:
            return 0
        self._ensure_banks()
        fid_to_row, vms, cps, gts = self._banks
        rows = np.asarray(
            [fid_to_row[self.sampler.sample().fid] for _ in range(k)],
            np.int32,
        )
        camera = self.camera
        skip_bottom_px = (
            int(round(camera.height * cfg.opt.skip_bottom_ratio))
            if cfg.opt.skip_bottom_ratio > 0
            else 0
        )
        self.model, self.opt_state, (losses, overflow, truncated) = train_steps_fused(
            self.model,
            self.opt_state,
            vms[rows],
            cps[rows],
            gts[rows],
            jnp.asarray(it),
            self._mask(camera),
            camera=camera,
            sh_degree=self.sh_degree,
            raster_cfg=self.raster_cfg,
            lr_cfg=self.lr_cfg,
            spatial_lr_scale=self.cameras_extent,
            bg=self.bg,
            lambda_dssim=cfg.opt.lambda_dssim,
            skip_bottom_px=skip_bottom_px,
            update_stats=it + k <= cfg.opt.densify_until_iter,
        )
        self.iteration = it + k
        self._it_dev = None  # resync the single-step device counter
        self._pending_losses.append((losses, overflow, truncated))
        if len(self._pending_losses) > 512:
            self.drain_losses()
        return k

    # -- live-tunable training parameters (`VariableParameters` analog,
    #    `include/gaussian_mapper.h:80-98`, setter farm
    #    `gaussian_mapper.cpp:986-1180`) --

    VARIABLE_PARAMS = (
        ("position_lr_init", "lr"),
        ("feature_lr", "lr"),
        ("opacity_lr", "lr"),
        ("scaling_lr", "lr"),
        ("rotation_lr", "lr"),
        ("percent_dense", "opt"),
        ("lambda_dssim", "opt"),
        ("opacity_reset_interval", "opt"),
        ("densify_grad_threshold", "opt"),
        ("densification_interval", "opt"),
        ("new_keyframe_times_of_use", "mapper"),
    )

    def get_variable_parameters(self) -> Dict[str, float]:
        out = {}
        for name, kind in self.VARIABLE_PARAMS:
            if kind == "lr":
                out[name] = getattr(self.lr_cfg, name)
            elif kind == "opt":
                out[name] = getattr(self.config.opt, name)
            else:
                out[name] = getattr(self.config.mapper, name)
        return out

    def set_variable_parameters(self, updates: Dict[str, float]):
        """Apply live updates mid-training. Learning-rate changes rebuild
        the (hashable, jit-static) LRConfig — one recompile per change, like
        the reference's per-frame setter sweep but without the mutex farm
        (the jitted step itself is pure)."""
        lr_updates = {}
        for name, val in updates.items():
            kinds = dict(self.VARIABLE_PARAMS)
            if name not in kinds:
                raise KeyError(name)
            kind = kinds[name]
            if kind == "lr":
                lr_updates[name] = type(getattr(self.lr_cfg, name))(val)
            elif kind == "opt":
                cur = getattr(self.config.opt, name)
                setattr(self.config.opt, name, type(cur)(val))
            else:
                cur = getattr(self.config.mapper, name)
                setattr(self.config.mapper, name, type(cur)(val))
                if name == "new_keyframe_times_of_use":
                    self.sampler.times_of_use = int(val)
        if lr_updates:
            self.lr_cfg = dataclasses.replace(self.lr_cfg, **lr_updates)

    # -- full-state checkpointing (beyond the reference's model-only PLY) --

    def save_checkpoint(self, path):
        from omnigs_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(path, self.model, self.opt_state, self.iteration)

    def load_checkpoint(self, path):
        from omnigs_tpu.train.checkpoint import load_checkpoint

        self.model, self.opt_state, self.iteration, _ = load_checkpoint(
            path, self.config.tpu.capacity
        )
        self._it_dev = None  # resync the device-side step counter

    def train(
        self,
        num_iterations: Optional[int] = None,
        log_every: int = 0,
        fuse: Optional[int] = None,
    ):
        n = num_iterations or self.config.opt.max_num_iterations
        fuse = self.config.tpu.fuse_steps if fuse is None else fuse
        t0 = time.time()
        end = self.iteration + n
        while self.iteration < end:
            budget = end - self.iteration
            if log_every:
                budget = min(
                    budget, log_every - self.iteration % log_every
                )
            took = self.train_window(min(budget, fuse)) if fuse > 1 else 0
            if took == 0:
                self.train_iteration()
            if log_every and self.iteration % log_every == 0:
                self.drain_losses()
                pressure = (
                    f" truncated={self.total_truncated}"
                    f" overflow={self.total_overflow}"
                    if self.total_truncated or self.total_overflow
                    else ""
                )
                print(
                    f"iter {self.iteration}: loss={self.last_loss:.4f} "
                    f"ema={self.ema_loss:.4f} "
                    f"n_active={int(self.model.num_active)} "
                    f"({(time.time() - t0):.1f}s)" + pressure,
                    flush=True,
                )
        return self.model
