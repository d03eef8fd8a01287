"""Binning edge cases: capacity truncation, ghost-aligned layout invariants,
seam/pole Gaussians, cover-count exactness."""

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops.binning import (
    bin_instances,
    bin_instances_aligned,
    tile_cover_counts,
)
from omnigs_tpu.ops.preprocess import preprocess, tile_grid
from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

from helpers import random_cloud, simple_cloud

CAMERA = Camera(CameraType.LONLAT, 64, 32)
GX, GY = tile_grid(CAMERA)


def _prep(n=32, seed=0):
    params = random_cloud(jax.random.PRNGKey(seed), n)
    return preprocess(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        CAMERA,
        jnp.eye(4),
        jnp.zeros(3),
        sh_degree=0,
    )


def test_cover_counts_match_instance_histogram():
    prep = _prep()
    counts = tile_cover_counts(prep.rect, prep.tiles_touched > 0, GX, GY)
    # brute force: per tile count of covering rects
    rect = np.asarray(prep.rect)
    emit = np.asarray(prep.tiles_touched) > 0
    want = np.zeros(GX * GY, np.int32)
    for t in range(GX * GY):
        tx, ty = t % GX, t // GX
        want[t] = np.sum(
            emit
            & (rect[:, 0] <= tx)
            & (tx < rect[:, 2])
            & (rect[:, 1] <= ty)
            & (ty < rect[:, 3])
        )
    np.testing.assert_array_equal(np.asarray(counts), want)


def test_aligned_layout_invariants():
    prep = _prep()
    chunk = 8
    inst = bin_instances_aligned(prep, GX, GY, 1 << 12, chunk)
    starts = np.asarray(inst.starts)
    counts = np.asarray(inst.counts)
    padded = ((counts + chunk - 1) // chunk) * chunk
    # starts are chunk-aligned and consistent with padded cumsum
    assert (starts % chunk == 0).all()
    np.testing.assert_array_equal(starts, np.cumsum(padded) - padded)
    # per tile: the first `count` slab entries carry this tile's gaussians
    # sorted by depth
    ref = bin_instances(prep, GX, GY, 1 << 12)
    rstarts = np.asarray(ref.starts)
    rg = np.asarray(ref.sorted_g)
    ag = np.asarray(inst.sorted_g)
    for t in range(GX * GY):
        c = counts[t]
        np.testing.assert_array_equal(
            ag[starts[t] : starts[t] + c], rg[rstarts[t] : rstarts[t] + c],
            err_msg=f"tile {t}",
        )


def test_truncation_contiguous_prefix():
    prep = _prep(n=48, seed=1)
    total = int(prep.tiles_touched.sum())
    cap = max(total // 2, 8)
    inst = bin_instances_aligned(prep, GX, GY, cap, 8)
    assert int(inst.truncated) == total - int(inst.num_instances)
    assert int(inst.num_instances) <= cap
    # counts must exactly match the emitted (truncated) instance set per tile
    counts = np.asarray(inst.counts)
    assert counts.sum() == int(inst.num_instances)


def test_truncated_render_still_finite():
    params, camera, vm, campos = simple_cloud(width=64, height=32)
    cfg = RasterConfig(max_instances=4, backend="pallas", interpret=True)
    res = rasterize(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        camera=camera,
        viewmatrix=vm,
        campos=campos,
        bg=jnp.zeros(3),
        sh_degree=0,
        config=cfg,
    )
    assert int(res.truncated) > 0
    assert bool(jnp.isfinite(res.image).all())


def test_seam_gaussian_clipped_not_wrapped():
    """A Gaussian behind the camera (lon ≈ ±π) must not wrap across the seam
    (reference behavior: non-cyclic getRect)."""
    n = 1
    params = dict(
        means3d=jnp.array([[0.0, 0.0, -2.0]]),  # lon = ±π, seam
        scales=jnp.full((n, 3), 0.3),
        quats=jnp.array([[1.0, 0, 0, 0]]),
        opacities=jnp.array([0.9]),
        shs=jnp.zeros((n, 16, 3)).at[:, 0, :].set(1.0),
    )
    res = rasterize(
        params["means3d"],
        params["scales"],
        params["quats"],
        params["opacities"],
        params["shs"],
        camera=CAMERA,
        viewmatrix=jnp.eye(4),
        campos=jnp.zeros(3),
        bg=jnp.zeros(3),
        sh_degree=0,
        config=RasterConfig(max_instances=1 << 12, tile_cap=64, chunk=8),
    )
    img = np.asarray(res.image)
    # the blob lands on ONE side of the seam only (the projected lon sign);
    # with the non-cyclic rect the other edge column stays background
    left = img[..., :2].sum()
    right = img[..., -2:].sum()
    assert (left == 0) != (right == 0), (left, right)


def test_pole_gaussian_renders():
    """A Gaussian near the pole (y-axis) must render finitely despite the
    Jacobian singularity guards."""
    n = 1
    params = dict(
        means3d=jnp.array([[1e-3, 2.0, 1e-3]]),
        scales=jnp.full((n, 3), 0.2),
        quats=jnp.array([[1.0, 0, 0, 0]]),
        opacities=jnp.array([0.9]),
        shs=jnp.zeros((n, 16, 3)).at[:, 0, :].set(1.0),
    )

    def render(m):
        return rasterize(
            m,
            params["scales"],
            params["quats"],
            params["opacities"],
            params["shs"],
            camera=CAMERA,
            viewmatrix=jnp.eye(4),
            campos=jnp.zeros(3),
            bg=jnp.zeros(3),
            sh_degree=0,
            config=RasterConfig(max_instances=1 << 12, tile_cap=64, chunk=8),
        ).image

    img = render(params["means3d"])
    assert bool(jnp.isfinite(img).all())
    assert float(img.sum()) > 0  # bottom rows light up (y-down = lat > 0)
    g = jax.grad(lambda m: jnp.sum(render(m)))(params["means3d"])
    assert bool(jnp.isfinite(g).all())


def test_tile_cull_counts_match_bruteforce():
    """tile_cull counts == brute-force count of instances whose max alpha
    over the tile pixel box reaches 1/255."""
    import jax
    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops.binning import bin_instances_aligned
    from omnigs_tpu.ops.preprocess import TILE, preprocess, tile_grid
    from helpers import random_cloud

    camera = Camera(CameraType.LONLAT, 64, 48)
    gx, gy = tile_grid(camera)
    params = random_cloud(jax.random.PRNGKey(11), 32)
    prep = preprocess(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"], camera, jnp.eye(4),
        jnp.zeros(3), 2,
    )
    inst = bin_instances_aligned(prep, gx, gy, 1 << 12, 128, tile_cull=True)

    rect = np.asarray(prep.rect)
    conic = np.asarray(prep.conic)
    m2d = np.asarray(prep.means2d)
    op = np.asarray(prep.opacity)
    tiles = np.asarray(prep.tiles_touched)
    expected = np.zeros(gx * gy, np.int32)
    for p in range(rect.shape[0]):
        if tiles[p] == 0:
            continue
        x0, y0, x1, y1 = rect[p]
        A, B, C = conic[p]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                best = 0.0
                lo_x, lo_y = tx * TILE, ty * TILE
                pts = [
                    (px, py)
                    for px in range(lo_x, lo_x + TILE)
                    for py in range(lo_y, lo_y + TILE)
                ]
                for px, py in pts:
                    dx, dy = m2d[p, 0] - px, m2d[p, 1] - py
                    q = A * dx * dx + 2 * B * dx * dy + C * dy * dy
                    best = max(best, float(np.exp(-0.5 * q)))
                if op[p] * best >= 1.0 / 255.0:
                    expected[ty * gx + tx] += 1
    counts = np.asarray(inst.counts)
    # never drop an instance that reaches 1/255 at any pixel center
    # (the cull bound is continuous-box-exact, hence conservative for the
    # pixel grid: counts may exceed expected, never undershoot)
    assert (counts >= expected).all()
    # and it must actually cull relative to rect coverage
    cover = np.asarray(
        bin_instances_aligned(prep, gx, gy, 1 << 12, 128).counts
    )
    assert (counts <= cover).all()
    assert counts.sum() < cover.sum()


def test_precull_big_gaussian_emit_all_identical():
    """Gaussians covering >MASK_TILES tiles take the emit-all path (all-ones
    mask + in-expansion re-test); output must equal the uncculled render."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from helpers import random_cloud

    camera = Camera(CameraType.LONLAT, 256, 128)  # 16x8 = 128 tiles
    pp = random_cloud(jax.random.PRNGKey(21), 64)
    # one huge gaussian covering most of the panorama (rect >> 64 tiles)
    pp["scales"] = pp["scales"].at[0].set(jnp.array([3.0, 3.0, 3.0]))
    pp["opacities"] = pp["opacities"].at[0].set(0.6)

    def run(cull):
        cfg = RasterConfig(
            max_instances=1 << 14, backend="pallas", interpret=True,
            tile_culling=cull,
        )
        return rasterize(
            pp["means3d"], pp["scales"], pp["quats"], pp["opacities"],
            pp["shs"], camera=camera, viewmatrix=jnp.eye(4),
            campos=jnp.zeros(3), bg=jnp.zeros(3), sh_degree=2, config=cfg,
        )

    culled, plain = run(True), run(False)
    assert int(culled.truncated) == 0 and int(plain.truncated) == 0
    np.testing.assert_allclose(
        np.asarray(culled.image), np.asarray(plain.image),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(culled.final_T), np.asarray(plain.final_T),
        rtol=1e-6, atol=1e-7,
    )
