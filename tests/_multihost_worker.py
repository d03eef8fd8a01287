"""Worker process for the multi-host lock-step test (test_multihost.py).

Launched 1× (single-process baseline, 8 virtual devices) or 2× (coordinated
processes, 4 virtual devices each) with the same (data=2, gauss=4) mesh and
the same synthetic scene; prints the per-iteration losses. Host-local data
loading is exercised implicitly: each 2-process worker materializes GT
images only for its own data row.
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    nproc = int(os.environ.get("MH_NPROC", "1"))
    pid = int(os.environ.get("MH_PROC_ID", "0"))
    devs = int(os.environ.get("MH_LOCAL_DEVICES", "8"))
    coord = os.environ.get("MH_COORD", "")

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devs}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from omnigs_tpu.parallel.distributed import initialize

    if nproc > 1:
        initialize(coord, nproc, pid)
    assert jax.device_count() == 8, jax.devices()

    import dataclasses

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.config import Config
    from omnigs_tpu.train.trainer_parallel import ParallelTrainer
    from test_trainer import _make_scene

    camera = Camera(CameraType.LONLAT, 32, 16)
    scene = _make_scene(camera, n_views=4, seed=11)
    cfg = Config()
    cfg.tpu = dataclasses.replace(
        cfg.tpu,
        capacity=64,
        max_instances=1 << 12,
        tile_cap=64,
        chunk=8,
        mesh_data=2,
        mesh_gauss=4,
        backend="xla",
    )
    cfg.opt.densify_from_iter = 3
    cfg.opt.densification_interval = 4
    cfg.opt.opacity_reset_interval = 0

    tr = ParallelTrainer(scene, cfg)
    tr.init_from_sfm()
    losses = []
    for _ in range(8):
        tr.train_iteration()
        losses.append(float(tr.drain_losses()))
    print("LOSSES " + json.dumps(losses), flush=True)
    print(
        "ROWS "
        + json.dumps({"pid": jax.process_index(), "rows": tr.local_rows}),
        flush=True,
    )


if __name__ == "__main__":
    main()
