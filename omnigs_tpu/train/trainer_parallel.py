"""Multi-device trainer: view-parallel batches × Gaussian-sharded model.

Assembles the shard_map training step (parallel/shard.py) into the same
mapper semantics as train/trainer.py: per iteration a *batch* of
``mesh.data`` keyframes (one per data group) is drawn from the times-of-use
sampler, gradients psum over the data axis, Adam runs on each Gaussian
shard, and densify/reset run per-shard at the reference cadence.

The single-GPU reference has no analog (SURVEY.md §2.11); this is the
BASELINE configs 4–5 path (view-sharded 1-host, Gaussians+views sharded
multi-host).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from omnigs_tpu.config import Config
from omnigs_tpu.model import optimizer as opt_ops
from omnigs_tpu.model.gaussians import from_pcd
from omnigs_tpu.ops.knn import mean_sq_knn_dist
from omnigs_tpu.ops.rasterize import RasterConfig
from omnigs_tpu.parallel.distributed import (
    data_batch,
    data_batch_seq,
    local_data_rows,
    make_global_mesh,
    replicate_from_host,
)
from omnigs_tpu.parallel.mesh import DATA_AXIS, GAUSS_AXIS
from omnigs_tpu.parallel.shard import (
    make_sharded_densify,
    make_sharded_train_step,
    make_sharded_train_window,
)
from omnigs_tpu.scene.scene import KeyframeSampler, Scene


@dataclasses.dataclass
class ParallelTrainer:
    scene: Scene
    config: Config
    seed: int = 0

    def __post_init__(self):
        cfg = self.config
        # process-spanning mesh: with jax.distributed initialized this
        # covers every host's devices (data axis outermost → DCN)
        self.mesh = make_global_mesh(
            data=cfg.tpu.mesh_data, gauss=cfg.tpu.mesh_gauss
        )
        self.n_data = self.mesh.shape[DATA_AXIS]
        # data rows this process owns — the only rows whose GT images it
        # ever touches (host-local data loading)
        self.local_rows = local_data_rows(self.mesh)
        if self.scene.cameras:
            self.camera = next(iter(self.scene.cameras.values()))
        else:
            self.camera = next(iter(self.scene.keyframes.values())).camera
        _, self.cameras_extent = self.scene.nerfpp_norm()
        from omnigs_tpu.config import raster_config_from

        # single source of truth for Tpu.* → RasterConfig (ADVICE r1: this
        # previously hand-built an XLA-backend config, making the sharded
        # Pallas path unreachable from this entry point)
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
        self.bg = jnp.ones(3) if cfg.model.white_background else jnp.zeros(3)
        self.sampler = KeyframeSampler(
            self.scene, cfg.mapper.new_keyframe_times_of_use, self.seed
        )
        self.iteration = 0
        self.ema_loss = 0.0
        self.last_loss = 0.0
        self.total_overflow = 0
        self.total_truncated = 0
        self._pending_losses = []
        self.key = jax.random.PRNGKey(self.seed)
        self._steps = {}
        self._windows = {}
        self._densify = None
        self.model = None
        self.opt_state = None
        self._gt_cache = {}

    # -- setup --

    def init_from_sfm(self):
        pts = jnp.asarray(self.scene.points)
        cols = jnp.asarray(self.scene.colors)
        d2 = mean_sq_knn_dist(pts)
        model = from_pcd(pts, cols, self.config.tpu.capacity, d2)
        opt_state = opt_ops.init_adam(model.params())
        # every process builds the same initial state from the (replicated)
        # SfM cloud; placement goes through make_array_from_callback, which
        # unlike device_put accepts process-spanning shardings
        self.model = jax.tree_util.tree_map(
            lambda x: replicate_from_host(self.mesh, x, P(GAUSS_AXIS)), model
        )
        count = replicate_from_host(self.mesh, opt_state.count)
        self.opt_state = jax.tree_util.tree_map(
            lambda x: replicate_from_host(self.mesh, x, P(GAUSS_AXIS)),
            opt_state.replace(count=None),
        ).replace(count=count)

    @property
    def sh_degree(self) -> int:
        return min(self.iteration // 1000, self.config.model.sh_degree)

    def _step_fn(self, update_stats: bool, do_adam: bool):
        key = (self.sh_degree, update_stats, do_adam)
        if key not in self._steps:
            self._steps[key] = make_sharded_train_step(
                self.mesh,
                self.camera,
                sh_degree=self.sh_degree,
                cfg=self.raster_cfg,
                lr_cfg=self.lr_cfg,
                spatial_lr_scale=self.cameras_extent,
                bg=self.bg,
                lambda_dssim=self.config.opt.lambda_dssim,
                skip_bottom_px=(
                    int(
                        round(
                            self.camera.height
                            * self.config.opt.skip_bottom_ratio
                        )
                    )
                    if self.config.opt.skip_bottom_ratio > 0
                    else 0
                ),
                update_stats=update_stats,
                do_adam=do_adam,
            )
        return self._steps[key]

    def _gt(self, kf):
        if kf.fid not in self._gt_cache:
            self._gt_cache[kf.fid] = np.asarray(kf.image).transpose(2, 0, 1)
        return self._gt_cache[kf.fid]

    def train_iteration(self):
        cfg = self.config
        self.iteration += 1
        it = self.iteration
        vpg = cfg.tpu.views_per_group
        kfs = [self.sampler.sample() for _ in range(self.n_data * vpg)]

        in_densify_phase = it < cfg.opt.densify_until_iter
        do_densify = (
            in_densify_phase
            and it > cfg.opt.densify_from_iter
            and it % cfg.opt.densification_interval == 0
        )
        do_reset = in_densify_phase and (
            cfg.opt.opacity_reset_interval
            and it % cfg.opt.opacity_reset_interval == 0
        )

        # the sampler sequence is identical on every process (same seed);
        # each process materializes ONLY its own data rows — GT bytes never
        # cross hosts, gradients do (psum over the data axis)
        # row d of the (n_data·vpg)-long batch belongs to data group
        # d // vpg; this process materializes rows of its own groups only
        rows = [
            g * vpg + v for g in self.local_rows for v in range(vpg)
        ]
        vms = data_batch(
            self.mesh,
            np.stack([np.asarray(kfs[d].viewmatrix) for d in rows]),
        )
        cps = data_batch(
            self.mesh, np.stack([np.asarray(kfs[d].campos) for d in rows])
        )
        gts = data_batch(
            self.mesh, np.stack([self._gt(kfs[d]) for d in rows])
        )

        step = self._step_fn(
            update_stats=in_densify_phase,
            do_adam=not do_densify and it < cfg.opt.max_num_iterations,
        )
        self.model, self.opt_state, aux = step(
            self.model, self.opt_state, vms, cps, gts, np.int32(it)
        )
        loss = aux["loss"]

        if do_densify:
            if self._densify is None:
                size_threshold = (
                    20 if it > cfg.opt.prune_big_point_after_iter else 0
                )
                self._densify = make_sharded_densify(
                    self.mesh,
                    max_grad=cfg.opt.densify_grad_threshold,
                    min_opacity=cfg.opt.densify_min_opacity,
                    extent=self.cameras_extent,
                    max_screen_size=size_threshold,
                    percent_dense=cfg.opt.percent_dense,
                    prune_by_extent=cfg.opt.prune_by_extent,
                )
            self.key, sub = jax.random.split(self.key)
            self.model, self.opt_state, _ = self._densify(
                self.model, self.opt_state, np.asarray(sub), np.int32(it)
            )

        if do_reset:
            from omnigs_tpu.model.densify import reset_opacity

            self.model, self.opt_state = jax.jit(reset_opacity)(
                self.model, self.opt_state
            )

        # lazy loss fetch (see Trainer.drain_losses): a float() here would
        # sync the whole mesh every iteration
        self._pending_losses.append(
            (loss, aux["overflow"], aux["truncated"])
        )
        if len(self._pending_losses) > 512:
            self.drain_losses()
        return loss

    # -- fused multi-step windows (sharded analog of Trainer.train_window) --

    def _next_event_iter(self, it: int) -> int:
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

    def _window_fn(self, update_stats: bool):
        key = (self.sh_degree, update_stats)
        if key not in self._windows:
            cfg = self.config
            self._windows[key] = make_sharded_train_window(
                self.mesh,
                self.camera,
                sh_degree=self.sh_degree,
                cfg=self.raster_cfg,
                lr_cfg=self.lr_cfg,
                spatial_lr_scale=self.cameras_extent,
                bg=self.bg,
                lambda_dssim=cfg.opt.lambda_dssim,
                skip_bottom_px=(
                    int(round(self.camera.height * cfg.opt.skip_bottom_ratio))
                    if cfg.opt.skip_bottom_ratio > 0
                    else 0
                ),
                update_stats=update_stats,
            )
        return self._windows[key]

    def train_window(self, max_steps: int) -> int:
        """Up to ``max_steps`` iterations as ONE scanned mesh program.
        Returns steps taken (0 ⇒ next iteration is an event)."""
        cfg = self.config
        it = self.iteration
        k = min(max_steps, self._next_event_iter(it) - 1 - it)
        if k <= 0:
            return 0
        vpg = cfg.tpu.views_per_group
        rows = [g * vpg + v for g in self.local_rows for v in range(vpg)]
        vms, cps, gts = [], [], []
        for _ in range(k):
            kfs = [
                self.sampler.sample() for _ in range(self.n_data * vpg)
            ]
            vms.append([np.asarray(kfs[d].viewmatrix) for d in rows])
            cps.append([np.asarray(kfs[d].campos) for d in rows])
            gts.append([self._gt(kfs[d]) for d in rows])
        win = self._window_fn(
            update_stats=it + k <= cfg.opt.densify_until_iter
        )
        self.model, self.opt_state, (losses, ov, tr) = win(
            self.model,
            self.opt_state,
            data_batch_seq(self.mesh, np.asarray(vms)),
            data_batch_seq(self.mesh, np.asarray(cps)),
            data_batch_seq(self.mesh, np.asarray(gts)),
            np.int32(it),
        )
        self.iteration = it + k
        self._pending_losses.append((losses, ov, tr))
        if len(self._pending_losses) > 512:
            self.drain_losses()
        return k

    def train(self, num_iterations=None, log_every: int = 0, fuse=None):
        """Driver loop: fused windows between events, single steps at
        events — mirrors Trainer.train."""
        import time as _time

        cfg = self.config
        n = num_iterations or cfg.opt.max_num_iterations
        fuse = cfg.tpu.fuse_steps if fuse is None else fuse
        t0 = _time.time()
        end = self.iteration + n
        while self.iteration < end:
            budget = end - self.iteration
            if log_every:
                budget = min(budget, log_every - self.iteration % log_every)
            took = self.train_window(min(budget, fuse)) if fuse > 1 else 0
            if took == 0:
                self.train_iteration()
            if log_every and self.iteration % log_every == 0:
                self.drain_losses()
                print(
                    f"iter {self.iteration}: loss={self.last_loss:.4f} "
                    f"ema={self.ema_loss:.4f} ({_time.time() - t0:.1f}s)",
                    flush=True,
                )

    def host_model(self):
        """Gather the sharded model to host arrays (eval / PLY export).
        Single-controller usage; multi-process eval should run on process 0
        after a checkpoint restore."""
        return jax.tree_util.tree_map(lambda x: np.asarray(x), self.model)

    # -- sharded full-state checkpointing --

    def save_checkpoint(self, path):
        from omnigs_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(path, self.model, self.opt_state, self.iteration)

    def load_checkpoint(self, path):
        """Restore directly into the mesh layout (sharded orbax read)."""
        from omnigs_tpu.train.checkpoint import load_checkpoint

        self.model, self.opt_state, self.iteration, _ = load_checkpoint(
            path, self.config.tpu.capacity, mesh=self.mesh
        )

    def drain_losses(self) -> float:
        if self._pending_losses:
            pend, self._pending_losses = self._pending_losses, []
            for x, ov, tr in pend:
                v = float(x)
                self.last_loss = v
                self.ema_loss = 0.4 * v + 0.6 * self.ema_loss
                self.total_overflow += int(ov)
                self.total_truncated += int(tr)
            if self.total_truncated or self.total_overflow:
                import warnings

                warnings.warn(
                    "capacity pressure: "
                    f"{self.total_truncated} instances truncated / "
                    f"{self.total_overflow} overflowed so far — raise "
                    "Tpu.max_instances / Tpu.aligned_cap",
                    stacklevel=2,
                )
        return self.last_loss
