"""Viewer-during-training wiring — the analog of the reference's viewer
thread launched alongside training (`/root/reference/examples/
train_360roam.cpp:318-324`, rendering through `GaussianMapper::renderFromPose`
under `mutex_render_`).

`start_live_viewer` serves the LIVE model over HTTP in a daemon thread and
exposes the trainer's runtime-mutable hyperparameters (the reference's
`VariableParameters`, `include/gaussian_mapper.h:80-98`) on /params, so the
page's editors change the running optimization.
"""

from __future__ import annotations

import threading


def make_live_render_fn(tr, scene, cfg, width: int):
    """Jitted render-from-pose closure over the trainer's live model."""
    import jax
    import jax.numpy as jnp

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.train.renderer import render_model

    kf0 = next(iter(scene.keyframes.values()))
    cam0 = kf0.camera
    height = max(width * cam0.height // cam0.width, 32)
    vcam = Camera(CameraType.LONLAT, width, height)
    sh_degree = cfg.model.sh_degree

    @jax.jit
    def _color(model, vm, campos, scale):
        return render_model(
            model, vcam, vm, campos, tr.bg, sh_degree, tr.raster_cfg,
            scale_modifier=scale,
        ).image.transpose(1, 2, 0)

    @jax.jit
    def _depth(model, vm, campos, scale):
        d = render_model(
            model, vcam, vm, campos, tr.bg, sh_degree, tr.raster_cfg,
            render_depth=True, scale_modifier=scale,
        ).image[0]
        return jnp.repeat((d / (jnp.max(d) + 1e-6))[..., None], 3, axis=-1)

    def render_fn(vm, campos, mode, scale=1.0):
        f = _depth if mode == "depth" else _color
        # reads the live model snapshot; jitted with the model as an
        # argument, so the static capacity means one compile per mode
        return f(tr.model, jnp.asarray(vm), jnp.asarray(campos),
                 jnp.asarray(scale))

    return render_fn, width, height


def start_live_viewer(tr, scene, cfg, port: int, width: int = 960):
    """Start the blocking viewer server in a daemon thread; returns it."""
    from omnigs_tpu.viewer.server import serve

    render_fn, width, height = make_live_render_fn(tr, scene, cfg, width)
    t = threading.Thread(
        target=serve,
        args=(render_fn, width, height, port),
        kwargs=dict(
            params_get=tr.get_variable_parameters,
            params_set=tr.set_variable_parameters,
        ),
        daemon=True,
    )
    t.start()
    return t
