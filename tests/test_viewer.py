"""Web viewer: serve a model, fetch the page and a rendered frame."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops.rasterize import RasterConfig
from omnigs_tpu.train.renderer import render_model
from omnigs_tpu.viewer.server import ViewerState, make_handler

from http.server import ThreadingHTTPServer

from test_renderer_flags import _model


def test_viewer_serves_page_and_frames():
    camera = Camera(CameraType.LONLAT, 64, 32)
    model = _model()
    cfg = RasterConfig(max_instances=1 << 12, tile_cap=64, chunk=8)

    def render_fn(vm, campos, mode, scale=1.0):
        res = render_model(
            model,
            camera,
            jnp.asarray(vm),
            jnp.asarray(campos),
            jnp.zeros(3),
            2,
            cfg,
            render_depth=(mode == "depth"),
            scale_modifier=scale,
        )
        return np.asarray(res.image).transpose(1, 2, 0)

    params = {"lambda_dssim": 0.2}
    state = ViewerState(
        render_fn, camera.width, camera.height,
        mask=np.ones((camera.height, camera.width), np.float32),
        params_get=lambda: dict(params),
        params_set=lambda u: params.update(u),
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read()
        assert b"omnigs_tpu viewer" in page

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps(
                {"yaw": 0.3, "pitch": 0.0, "pos": [0, 0, 0], "mode": "color"}
            ).encode(),
            method="POST",
        )
        jpg = urllib.request.urlopen(req, timeout=120).read()
        assert jpg[:2] == b"\xff\xd8"  # JPEG magic
        assert len(jpg) > 100

        # depth mode too
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/render",
            data=json.dumps({"mode": "depth"}).encode(),
            method="POST",
        )
        jpg = urllib.request.urlopen(req, timeout=120).read()
        assert jpg[:2] == b"\xff\xd8"

        # live-params bridge (VariableParameters analog)
        got = json.loads(
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/params", timeout=30
            ).read()
        )
        assert got == {"lambda_dssim": 0.2}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/params",
            data=json.dumps({"lambda_dssim": 0.35}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=30).read()
        assert params["lambda_dssim"] == 0.35
    finally:
        httpd.shutdown()


def test_live_viewer_during_training():
    """Viewer thread alongside a real Trainer (≡ train_360roam.cpp:318-324):
    frames render from the live model while training advances, and a /params
    POST changes the running trainer's hyperparameters."""
    import dataclasses

    from omnigs_tpu.config import Config
    from omnigs_tpu.train.trainer import Trainer
    from omnigs_tpu.viewer.live import make_live_render_fn
    from test_trainer import _make_scene

    camera = Camera(CameraType.LONLAT, 32, 16)
    scene = _make_scene(camera, n_views=2, seed=5)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu, capacity=64, max_instances=1 << 12, tile_cap=64, chunk=8
    )
    cfg.opt.densify_from_iter = 1000
    cfg.opt.opacity_reset_interval = 0

    tr = Trainer(scene, cfg)
    tr.init_from_sfm()

    render_fn, w, h = make_live_render_fn(tr, scene, cfg, width=32)
    state = ViewerState(
        render_fn, w, h,
        params_get=tr.get_variable_parameters,
        params_set=tr.set_variable_parameters,
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def frame():
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/render",
                data=json.dumps({"mode": "color"}).encode(),
                method="POST",
            )
            return urllib.request.urlopen(req, timeout=120).read()

        jpg0 = frame()
        assert jpg0[:2] == b"\xff\xd8"
        tr.train_iteration()
        tr.train_iteration()
        jpg1 = frame()  # renders the trained (mutated) model
        assert jpg1[:2] == b"\xff\xd8"

        # live tuning reaches the RUNNING trainer
        before = tr.get_variable_parameters()
        assert "lambda_dssim" in before
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/params",
            data=json.dumps({"lambda_dssim": 0.42}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=30).read()
        assert tr.get_variable_parameters()["lambda_dssim"] == 0.42
        tr.train_iteration()  # still trains after the change
    finally:
        httpd.shutdown()


def test_trainer_checkpoint_resume(tmp_path):
    """Full-state resume continues bit-exact from the same model/opt state."""
    import dataclasses

    from omnigs_tpu.config import Config
    from omnigs_tpu.train.trainer import Trainer
    from test_trainer import _make_scene

    camera = Camera(CameraType.LONLAT, 32, 16)
    scene = _make_scene(camera, n_views=2, seed=3)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu, capacity=64, max_instances=1 << 12, tile_cap=64, chunk=8
    )
    cfg.opt.densify_from_iter = 1000
    cfg.opt.opacity_reset_interval = 0

    tr = Trainer(scene, cfg)
    tr.init_from_sfm()
    for _ in range(3):
        tr.train_iteration()
    tr.save_checkpoint(tmp_path / "ck")
    xyz_before = np.asarray(tr.model.xyz)

    tr2 = Trainer(scene, cfg)
    tr2.init_from_sfm()
    tr2.load_checkpoint(tmp_path / "ck")
    assert tr2.iteration == 3
    np.testing.assert_array_equal(np.asarray(tr2.model.xyz), xyz_before)
    np.testing.assert_array_equal(
        np.asarray(tr2.opt_state.mu["xyz"]), np.asarray(tr.opt_state.mu["xyz"])
    )
