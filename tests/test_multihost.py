"""Multi-host execution layer (VERDICT r1 item 3; BASELINE config 5 axis).

Two coordinated CPU processes (4 virtual devices each) must train
LOCK-STEP-IDENTICAL losses to one process with the same 8-device
(data=2, gauss=4) mesh. Each 2-process worker owns one data row and only
materializes GT images for it — host-local data loading over the same
global sampler sequence.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).resolve().parent / "_multihost_worker.py"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(env_extra, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, str(WORKER)],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def _losses(proc):
    assert proc.returncode == 0, proc.stderr[-4000:]
    for line in proc.stdout.splitlines():
        if line.startswith("LOSSES "):
            return json.loads(line[len("LOSSES "):])
    raise AssertionError(f"no LOSSES line in: {proc.stdout[-2000:]}")


def _rows(proc):
    for line in proc.stdout.splitlines():
        if line.startswith("ROWS "):
            return json.loads(line[len("ROWS "):])
    raise AssertionError("no ROWS line")


@pytest.mark.slow
def test_two_processes_match_single_process():
    single = _run({"MH_NPROC": "1", "MH_LOCAL_DEVICES": "8"})
    ref = _losses(single)
    assert all(np.isfinite(ref)), ref

    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            "MH_NPROC": "2",
            "MH_PROC_ID": str(pid),
            "MH_LOCAL_DEVICES": "4",
            "MH_COORD": f"127.0.0.1:{port}",
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(WORKER)],
                env={**{k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}, **env},
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(
            subprocess.CompletedProcess(p.args, p.returncode, out, err)
        )

    l0, l1 = _losses(outs[0]), _losses(outs[1])
    # both processes observe the same global (psum'd) loss
    np.testing.assert_allclose(l0, l1, rtol=0, atol=0)
    # and it matches the single-process mesh bit-for-bit (same devices,
    # same math, only the controller count differs)
    np.testing.assert_allclose(l0, ref, rtol=1e-6)
    # host-local ownership: each process owns exactly one distinct data row
    r0, r1 = _rows(outs[0]), _rows(outs[1])
    assert sorted(r0["rows"] + r1["rows"]) == [0, 1]


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Save from a sharded ParallelTrainer, restore INTO the mesh layout."""
    import dataclasses

    import jax

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.config import Config
    from omnigs_tpu.train.trainer_parallel import ParallelTrainer

    import sys as _sys

    _sys.path.insert(0, str(Path(__file__).resolve().parent))
    from test_trainer import _make_scene

    camera = Camera(CameraType.LONLAT, 32, 16)
    scene = _make_scene(camera, n_views=2, seed=5)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu, capacity=64, max_instances=1 << 12, tile_cap=64, chunk=8,
        mesh_data=2, mesh_gauss=4, backend="xla",
    )
    cfg.opt.densify_from_iter = 1000
    cfg.opt.opacity_reset_interval = 0

    tr = ParallelTrainer(scene, cfg)
    tr.init_from_sfm()
    for _ in range(2):
        tr.train_iteration()
    tr.drain_losses()
    tr.save_checkpoint(tmp_path / "ck")
    xyz = np.asarray(tr.model.xyz)

    tr2 = ParallelTrainer(scene, cfg)
    tr2.load_checkpoint(tmp_path / "ck")
    assert tr2.iteration == 2
    # restored arrays carry the mesh sharding
    from omnigs_tpu.parallel.mesh import GAUSS_AXIS
    from jax.sharding import PartitionSpec as P

    assert tr2.model.xyz.sharding.spec == P(GAUSS_AXIS)
    np.testing.assert_array_equal(np.asarray(tr2.model.xyz), xyz)
    np.testing.assert_array_equal(
        np.asarray(tr2.opt_state.mu["xyz"]), np.asarray(tr.opt_state.mu["xyz"])
    )
