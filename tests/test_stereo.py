"""Tests for ops/stereo.py against a brute-force oracle that mirrors the
reference CUDA loops (`/root/reference/src/stereo_vision.cu:42-139`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.ops.stereo import inactive_geo_densify, reproject_depth_pinhole

INTR = (200.0, 210.0, 32.0, 24.0)
WIDTH = 64


def _oracle_reproject(depth, mask, intr, width):
    fx, fy, cx, cy = intr
    out = np.zeros((depth.shape[0], 3), np.float32)
    for i in range(depth.shape[0]):
        if not mask[i]:
            continue
        v, u = divmod(i, width)
        d = depth[i]
        out[i] = [(u - cx) * d / fx, (v - cy) * d / fy, d]
    return out


def _oracle_densify(pix, has3d, pts, colors, max_dist, intr, width):
    # per-thread loop of stereo_vision.cu:66-139 + the host-side z>0 filter
    fx, fy, cx, cy = intr
    n = pix.shape[0]
    out_pt = np.zeros((n, 3), np.float32)
    out_c = np.zeros((n, 3), np.float32)
    for i in range(n):
        u, v = pix[i]
        if has3d[i]:
            out_pt[i] = pts[i]
            out_c[i] = colors[int(v) * width + int(u)]
            continue
        min_dist, depth = np.inf, -1.0
        for j in range(n):
            if not has3d[j] or j == i:
                continue
            d2 = (u - pix[j, 0]) ** 2 + (v - pix[j, 1]) ** 2
            if d2 > max_dist or d2 >= min_dist:
                continue
            min_dist, depth = d2, pts[j, 2]
        if depth > 0:
            out_pt[i] = [(u - cx) * depth / fx, (v - cy) * depth / fy, depth]
            out_c[i] = colors[int(v) * width + int(u)]
        else:
            out_pt[i, 2] = -1.0
    valid = out_pt[:, 2] > 0
    return out_pt, out_c, valid


def test_reproject_matches_oracle():
    rng = np.random.default_rng(0)
    p = WIDTH * 48
    depth = rng.uniform(0.5, 5.0, p).astype(np.float32)
    mask = rng.random(p) < 0.7
    got = reproject_depth_pinhole(
        jnp.asarray(depth), jnp.asarray(mask), INTR, WIDTH
    )
    np.testing.assert_allclose(
        np.asarray(got), _oracle_reproject(depth, mask, INTR, WIDTH),
        rtol=1e-6, atol=1e-6,
    )


@pytest.mark.parametrize("max_dist", [25.0, 400.0])
def test_densify_matches_oracle(max_dist):
    rng = np.random.default_rng(1)
    n, h = 64, 48
    pix = np.stack(
        [rng.integers(0, WIDTH, n), rng.integers(0, h, n)], axis=-1
    ).astype(np.float32)
    has3d = rng.random(n) < 0.5
    pts = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.2, 4.0, n)  # positive depths where has3d
    pts[rng.random(n) < 0.1, 2] = -0.5  # some bad depths among has3d too
    colors = rng.random((WIDTH * h, 3)).astype(np.float32)

    got_pt, got_c, got_valid = inactive_geo_densify(
        jnp.asarray(pix), jnp.asarray(has3d), jnp.asarray(pts),
        jnp.asarray(colors), max_dist, INTR, WIDTH,
    )
    exp_pt, exp_c, exp_valid = _oracle_densify(
        pix, has3d, pts, colors, max_dist, INTR, WIDTH
    )
    np.testing.assert_array_equal(np.asarray(got_valid), exp_valid)
    np.testing.assert_allclose(
        np.asarray(got_pt)[exp_valid], exp_pt[exp_valid], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_c)[exp_valid], exp_c[exp_valid], rtol=1e-6, atol=1e-6
    )


def test_densify_tie_breaks_to_lowest_index():
    # two has3D neighbors at the same distance: reference keeps the first
    pix = jnp.asarray([[10.0, 10.0], [8.0, 10.0], [12.0, 10.0]])
    has3d = jnp.asarray([False, True, True])
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0], [0.0, 0.0, 3.0]])
    colors = jnp.ones((WIDTH * 32, 3))
    got_pt, _, valid = inactive_geo_densify(
        pix, has3d, pts, colors, 100.0, INTR, WIDTH
    )
    assert bool(valid[0])
    np.testing.assert_allclose(float(got_pt[0, 2]), 2.0)
