#!/usr/bin/env python
"""EgoNeRF (OmniBlender / Ricoh360) training entry point — analog of
`train_egonerf_omniblender` / `train_egonerf_ricoh360`
(`/root/reference/examples/train_egonerf_*.cpp`; they differ from the
360Roam loader only in dataset paths and double-precision PLY xyz, which
io/ply.py handles automatically).

Usage: python examples/train_egonerf.py CFG_YAML SCENE_ROOT OUTPUT_DIR [extra args]
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
