#!/usr/bin/env python
"""Write a rescaled copy of a synthetic openMVG scene's sfm_data jsons.

The image loader resizes to the camera's declared dims at load time
(io/native_loader.load_image), so a lower-resolution protocol run needs
only new jsons pointing at the same images with scaled width/height.

Usage: rescale_scene.py SCENE_DIR OUT_DIR SCALE_DIV
"""
import json
import shutil
import sys
from pathlib import Path

src, dst, div = Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3])
dst.mkdir(parents=True, exist_ok=True)
for name in ("sfm_data_train.json", "sfm_data_test.json"):
    d = json.loads((src / name).read_text())
    for v in d["views"]:
        vd = v["value"]["ptr_wrapper"]["data"]
        vd["width"] //= div
        vd["height"] //= div
    for i in d.get("intrinsics", []):
        p = i["value"]["ptr_wrapper"]["data"]
        if "width" in p:
            p["width"] //= div
            p["height"] //= div
    (dst / name).write_text(json.dumps(d))
shutil.copy(src / "points.ply", dst / "points.ply")
# images dir is shared by reference, not copied; resolve the target so a
# relative SCENE_DIR doesn't produce a dangling link, and allow reruns
link = dst / "images"
link.unlink(missing_ok=True)
link.symlink_to((src / "images").resolve())
print("rescaled", src, "->", dst, "/", div)
