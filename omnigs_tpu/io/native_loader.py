"""ctypes bindings for the native C++ image loader (native/loader.cpp).

Falls back to PIL transparently when the shared library hasn't been built
(`native/build.sh`). The pool keeps JPEG/PNG decode + bilinear resize off
the GIL — the TPU-host equivalent of the reference's C++/OpenCV image path
(`/root/reference/examples/train_360roam.cpp:186-196`).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libomnigs_loader.so"
_lib: Optional[ctypes.CDLL] = None


def build_native(force: bool = False) -> bool:
    """Compile the shared library. Returns True on success."""
    if _SO_PATH.exists() and not force:
        return True
    try:
        subprocess.run(
            ["sh", str(_NATIVE_DIR / "build.sh")], check=True, capture_output=True
        )
        return _SO_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO_PATH.exists() and not build_native():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.loader_fetch.restype = ctypes.c_int
    lib.loader_fetch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.decode_image.restype = ctypes.c_int
    lib.decode_image.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def load_image(path, width: int, height: int) -> np.ndarray:
    """Decode + resize one image to (height, width, 3) float32 in [0, 1]."""
    lib = _load()
    if lib is not None:
        out = np.empty((height, width, 3), np.float32)
        rc = lib.decode_image(
            str(path).encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            width,
            height,
        )
        if rc == 0:
            return out
    # PIL fallback
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((width, height), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


class ImagePool:
    """Prefetching image loader over the native thread pool."""

    def __init__(self, width: int, height: int, n_threads: int = 4):
        self.width = width
        self.height = height
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.loader_create(n_threads, width, height)

    def load_all(
        self, paths: Iterable
    ) -> Iterator[Tuple[int, np.ndarray]]:
        """Yield (index, image) for every path, in completion order."""
        paths = list(paths)
        if self._handle is None:
            for i, p in enumerate(paths):
                yield i, load_image(p, self.width, self.height)
            return
        for i, p in enumerate(paths):
            self._lib.loader_submit(self._handle, str(p).encode(), i)
        out = np.empty((self.height, self.width, 3), np.float32)
        for _ in paths:
            rc = self._lib.loader_fetch(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if rc < 0:
                idx = -1 - rc
                # decode failure → PIL fallback for that file
                yield idx, load_image(paths[idx], self.width, self.height)
            else:
                yield rc, out.copy()

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
