"""Native C++ image loader (native/loader.cpp via ctypes): build, decode,
resize, thread-pool prefetch — and exact agreement with the PIL fallback
path shape/range contract."""

import numpy as np
import pytest
from PIL import Image

from omnigs_tpu.io import native_loader


@pytest.fixture(scope="module")
def png_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        arr = (rng.random((40, 64, 3)) * 255).astype(np.uint8)
        p = d / f"im{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_loader.build_native(), "native loader failed to build"
    assert native_loader.native_available()


def test_decode_resize_matches_pil(tmp_path):
    """On smooth content, point-bilinear (native) and PIL's antialiased
    bilinear agree closely (they diverge on high-frequency noise by
    design — PIL area-averages on downscale)."""
    if not native_loader.native_available():
        pytest.skip("native loader unavailable")
    y, x = np.mgrid[0:40, 0:64]
    arr = np.stack(
        [x * 255 / 63, y * 255 / 39, (x + y) * 255 / 102], axis=-1
    ).astype(np.uint8)
    p = tmp_path / "grad.png"
    Image.fromarray(arr).save(p)
    got = native_loader.load_image(p, 32, 20)
    assert got.shape == (20, 32, 3)
    assert got.dtype == np.float32
    ref = (
        np.asarray(
            Image.open(p).convert("RGB").resize((32, 20), Image.BILINEAR),
            np.float32,
        )
        / 255.0
    )
    assert np.mean(np.abs(got - ref)) < 0.02
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_image_pool_loads_all(png_files):
    pool = native_loader.ImagePool(16, 10, n_threads=2)
    seen = {}
    for idx, img in pool.load_all(png_files):
        assert img.shape == (10, 16, 3)
        seen[idx] = img
    assert sorted(seen) == [0, 1, 2]


def test_identity_size_roundtrip(png_files):
    """Decoding at the source resolution reproduces the pixels exactly."""
    if not native_loader.native_available():
        pytest.skip("native loader unavailable")
    p = png_files[1]
    src = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    got = native_loader.load_image(p, src.shape[1], src.shape[0])
    np.testing.assert_allclose(got, src, atol=1 / 255.0 + 1e-6)
