"""Depth-presorted packed-key binning (`bin_instances_packed`) must produce
the exact slab layout of the stable (tile, depth) 2-key sort — same per-tile
segments with the same composited order (including depth ties) — and the
end-to-end render/gradients must match bit-for-bit modulo reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops.binning import bin_instances, bin_instances_packed
from omnigs_tpu.ops.preprocess import preprocess, tile_grid
from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

from helpers import random_cloud

CAMERA = Camera(CameraType.LONLAT, 128, 64)
GX, GY = tile_grid(CAMERA)


def _prep(n=64, seed=3):
    params = random_cloud(jax.random.PRNGKey(seed), n)
    return preprocess(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"], CAMERA, jnp.eye(4),
        jnp.zeros(3), sh_degree=2,
    )


@pytest.mark.parametrize("tile_cull", [False, True])
def test_packed_layout_matches_two_key_sort(tile_cull):
    prep = _prep()
    R = 1 << 12
    ref = bin_instances(prep, GX, GY, R, tile_cull=tile_cull)
    pk = bin_instances_packed(prep, GX, GY, R, tile_cull=tile_cull)
    np.testing.assert_array_equal(np.asarray(pk.counts), np.asarray(ref.counts))
    np.testing.assert_array_equal(np.asarray(pk.starts), np.asarray(ref.starts))
    perm = np.asarray(pk.perm)
    inv = np.asarray(pk.inv_perm)
    np.testing.assert_array_equal(perm[inv], np.arange(perm.shape[0]))
    # decoded gaussian ids must match per live segment, in order
    got = perm[np.asarray(pk.sorted_g)]
    want = np.asarray(ref.sorted_g)
    starts, counts = np.asarray(ref.starts), np.asarray(ref.counts)
    for t in range(GX * GY):
        s, c = starts[t], counts[t]
        np.testing.assert_array_equal(
            got[s : s + c], want[s : s + c], err_msg=f"tile {t}"
        )


def test_packed_handles_depth_ties():
    """Identical depths must keep original gaussian order (reference stable
    radix parity): duplicate one gaussian so two instances tie exactly."""
    params = random_cloud(jax.random.PRNGKey(7), 32)
    params = {
        k: jnp.concatenate([v, v[:1]]) for k, v in params.items()
    }  # gaussian 32 is a clone of 0 → exact depth tie, same tiles
    prep = preprocess(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"], CAMERA, jnp.eye(4),
        jnp.zeros(3), sh_degree=2,
    )
    R = 1 << 12
    ref = bin_instances(prep, GX, GY, R)
    pk = bin_instances_packed(prep, GX, GY, R)
    got = np.asarray(pk.perm)[np.asarray(pk.sorted_g)]
    want = np.asarray(ref.sorted_g)
    starts, counts = np.asarray(ref.starts), np.asarray(ref.counts)
    for t in range(GX * GY):
        s, c = starts[t], counts[t]
        np.testing.assert_array_equal(got[s : s + c], want[s : s + c])


def test_packed_truncation_is_depth_ordered_and_counted():
    """Over-capacity emission: the packed path drops the DEEPEST gaussians'
    instances (depth-order tail truncation) — deterministic, counted, and
    the same truncated total as bin_instances' original-id-order drop."""
    prep = _prep(n=128, seed=4)
    total = int(jnp.sum(prep.tiles_touched))
    cap = max(total // 2, 16)
    ref = bin_instances(prep, GX, GY, cap)
    pk = bin_instances_packed(prep, GX, GY, cap)
    assert int(pk.truncated) == int(ref.truncated) == total - cap
    # every emitted instance belongs to the cap shallowest emission slots:
    # the surviving rank set must be a prefix of depth ranks
    got_ranks = np.asarray(pk.sorted_g)
    starts, counts = np.asarray(pk.starts), np.asarray(pk.counts)
    live = np.concatenate(
        [got_ranks[s : s + c] for s, c in zip(starts, counts)]
    )
    depths = np.asarray(prep.depths)[np.asarray(pk.perm)]
    assert depths[live].max() <= depths[live.max()] + 1e-6


@pytest.mark.parametrize("gather_reduce", [False, True])
def test_packed_end_to_end_matches(gather_reduce):
    params = random_cloud(jax.random.PRNGKey(11), 64)
    base = dict(
        max_instances=1 << 12, backend="pallas", interpret=True,
        tile_culling=True,
    )

    def run(depth_presort):
        cfg = RasterConfig(
            depth_presort=depth_presort, gather_reduce=gather_reduce, **base
        )

        def loss(m, s, q, o, sh):
            res = rasterize(
                m, s, q, o, sh, camera=CAMERA, viewmatrix=jnp.eye(4),
                campos=jnp.zeros(3), bg=jnp.zeros(3), sh_degree=2,
                config=cfg,
            )
            return jnp.sum(res.image ** 2), res.image

        (v, img), g = jax.value_and_grad(loss, argnums=(0, 3), has_aux=True)(
            params["means3d"], params["scales"], params["quats"],
            params["opacities"], params["shs"],
        )
        return img, g

    img_a, g_a = run(False)
    img_b, g_b = run(True)
    # identical composited order ⇒ identical image bits
    np.testing.assert_array_equal(np.asarray(img_b), np.asarray(img_a))
    # scatter reduction: same slab row order ⇒ same per-gaussian partial-sum
    # order ⇒ (near-)exact. gather reduction: the cumsum runs in emission
    # order, which DIFFERS between original-major and depth-rank-major
    # emission ⇒ O(eps·|cs|) rounding differences.
    rtol, af = (2e-3, 1e-4) if gather_reduce else (1e-6, 1e-6)
    for a, b in zip(g_a, g_b):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, rtol=rtol, atol=af * (np.abs(a).max() + 1e-12)
        )
