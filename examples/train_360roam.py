#!/usr/bin/env python
"""360Roam training entry point — `train_360roam` analog
(`/root/reference/examples/train_360roam.cpp:259-336`).

Thin wrapper over train_openmvg_lonlat.py with the 360Roam scene layout
(`<scene>/openMVG/data_openmvg.json` + `<scene>/openMVG/scene.ply`).

Usage: python examples/train_360roam.py CFG_YAML SCENE_ROOT OUTPUT_DIR [extra args]
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    cfg, scene_root, out = sys.argv[1:4]
    scene = Path(scene_root)
    sys.exit(
        subprocess.run(
            [
                sys.executable,
                str(REPO / "examples" / "train_openmvg_lonlat.py"),
                cfg,
                out,
                str(scene / "openMVG" / "data_openmvg.json"),
                str(scene / "openMVG" / "scene.ply"),
                *sys.argv[4:],
            ]
        ).returncode
    )


if __name__ == "__main__":
    main()
