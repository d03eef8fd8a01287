"""Gather-based gradient reduction (RasterConfig.gather_reduce): the
survivor-rank inversion + cumsum/segment-diff path must reproduce the
scatter-add reduction's per-Gaussian gradients on both slab layouts,
including under capacity trimming (VERDICT r3 task 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnigs_tpu.cameras import Camera, CameraType
from omnigs_tpu.ops.binning import _gather_1d
from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

from helpers import random_cloud

CAMERA = Camera(CameraType.LONLAT, 128, 64)


def _grads(params, cfg, seed=0):
    def loss(m, s, q, o, sh):
        res = rasterize(
            m, s, q, o, sh,
            camera=CAMERA,
            viewmatrix=jnp.eye(4),
            campos=jnp.zeros(3),
            bg=jnp.zeros(3),
            sh_degree=2,
            config=cfg,
        )
        # non-uniform weighting so per-instance rows differ
        w = jnp.linspace(0.5, 1.5, res.image.size).reshape(res.image.shape)
        return jnp.sum(res.image * w)

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"],
    )


@pytest.mark.parametrize("ghost_align", [False, True])
@pytest.mark.parametrize("tile_culling", [False, True])
def test_gather_matches_scatter(ghost_align, tile_culling):
    params = random_cloud(jax.random.PRNGKey(3), 64)
    base = dict(
        max_instances=1 << 12,
        backend="pallas",
        interpret=True,
        ghost_align=ghost_align,
        tile_culling=tile_culling,
    )
    g_scatter = _grads(params, RasterConfig(**base))
    g_gather = _grads(params, RasterConfig(gather_reduce=True, **base))
    for a, b, name in zip(
        g_scatter, g_gather, ["means", "scales", "quats", "opac", "shs"]
    ):
        a, b = np.asarray(a), np.asarray(b)
        # identical rows, different summation order: the cumsum+diff error is
        # O(eps·|running cumsum|), so tolerance scales with the grad range
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4 * np.abs(a).max() + 1e-8,
            err_msg=f"{name} ghost={ghost_align} cull={tile_culling}",
        )


def test_gather_matches_scatter_under_trim():
    """Cap-trimming drops whole tiles from the slab; the untrimmed
    survivor-rank payload must keep segments aligned (trimmed rows read the
    zero pad row) and reproduce the scatter path exactly as trimmed."""
    params = random_cloud(jax.random.PRNGKey(5), 96)
    base = dict(
        max_instances=1 << 12,
        aligned_cap=256,  # small enough to trim real tiles
        backend="pallas",
        interpret=True,
    )
    g_scatter = _grads(params, RasterConfig(**base))
    g_gather = _grads(params, RasterConfig(gather_reduce=True, **base))
    finite = all(bool(jnp.isfinite(g).all()) for g in g_gather)
    assert finite
    for a, b in zip(g_scatter, g_gather):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4 * np.abs(a).max() + 1e-8
        )


def test_gather_1d_matches_plain_indexing():
    vals = jax.random.randint(jax.random.PRNGKey(0), (1000,), 0, 1 << 20)
    idx = jax.random.randint(jax.random.PRNGKey(1), (257,), 0, 1000)
    np.testing.assert_array_equal(
        np.asarray(_gather_1d(vals, idx)), np.asarray(vals)[np.asarray(idx)]
    )


def test_two_level_chunked_segment_sums_exact():
    """The production (chunked) path of gather_reduce_rows: chunk-local
    cumsums + one-hot totals matmul must match f64 per-segment sums to
    f32 accumulation noise — including segments that span chunk
    boundaries and rows with a ~1e4 dynamic range (the conic-row profile
    that broke the single-global-cumsum version at bench scale: 5e-2
    relative error on chip, check_jit_parity full-scale leg)."""
    from omnigs_tpu.ops.binning import E_SENTINEL
    from omnigs_tpu.ops.pallas_raster import gather_reduce_rows

    rng = np.random.default_rng(7)
    CH = 1 << 16
    r_slab = 4 * CH  # n_full = 4 > 1 → chunked two-level path
    n_live = r_slab - 5000
    P = 4096

    # huge dynamic range rows (conic-like) with random sign
    mag = 10.0 ** rng.uniform(-2, 2, size=(n_live, 1))
    rows = (rng.standard_normal((n_live, 9)) * mag).astype(np.float32)
    rows_slab = np.zeros((r_slab, 9), np.float32)

    # random contiguous segments over ranks: gaussian g owns
    # [bounds[g], bounds[g+1]) — many empty, some spanning chunks
    cuts = np.sort(rng.integers(0, n_live + 1, size=P - 1))
    bounds = np.concatenate([[0], cuts, [n_live]]).astype(np.int32)
    seg_lo, seg_hi = bounds[:-1], bounds[1:]

    # scatter ranks to random slab positions (the inversion-sort input)
    perm = rng.permutation(r_slab)[:n_live]
    sorted_e = np.full((r_slab,), E_SENTINEL, np.int32)
    sorted_e[perm] = np.arange(n_live, dtype=np.int32)
    rows_slab[perm] = rows

    out = np.asarray(
        jax.jit(gather_reduce_rows)(
            jnp.asarray(rows_slab), jnp.asarray(sorted_e),
            jnp.asarray(seg_lo), jnp.asarray(seg_hi),
        )
    )
    ref = np.add.reduceat(
        rows.astype(np.float64), np.minimum(seg_lo, n_live - 1)
    )
    ref[seg_lo == seg_hi] = 0.0
    ref = ref[: len(seg_lo)]
    scale = np.abs(ref).max()
    err = np.abs(out - ref).max() / scale
    assert err < 2e-5, err


def test_last_segment_tail_block_not_double_counted():
    """Deterministic regression for the block-ownership hole (ADVICE r4 #1):
    the final nonempty segment has no successor lo to bound its tail, so
    when the last Gaussian's segment crosses a 128-row block boundary and
    live % 128 != 0, its tail block was BOTH scatter-added via the owned
    block totals AND re-added via the in-block prefix Lhi — and every
    all-sentinel block past `live` was silently attributed to Gaussian
    P-1. seed-7 in the random test above happens to dodge this geometry;
    this case pins it: seg_hi[-1] = n_live = 4·2^16 − 64 (live % 128 ≠ 0)
    with seg_lo[-1] far below the last block boundary."""
    from omnigs_tpu.ops.binning import E_SENTINEL
    from omnigs_tpu.ops.pallas_raster import gather_reduce_rows

    rng = np.random.default_rng(11)
    CH = 1 << 16
    r_slab = 4 * CH  # chunked two-level path
    n_live = r_slab - 64  # live % 128 != 0; sentinel tail in last block
    P = 4

    # last Gaussian's segment spans the final block boundary
    bounds = np.array(
        [0, CH, 2 * CH + 77, (n_live // 128) * 128 - 1000, n_live],
        np.int32,
    )
    seg_lo, seg_hi = bounds[:-1], bounds[1:]

    mag = 10.0 ** rng.uniform(-2, 2, size=(n_live, 1))
    rows = (rng.standard_normal((n_live, 9)) * mag).astype(np.float32)
    rows_slab = np.zeros((r_slab, 9), np.float32)
    perm = rng.permutation(r_slab)[:n_live]
    sorted_e = np.full((r_slab,), E_SENTINEL, np.int32)
    sorted_e[perm] = np.arange(n_live, dtype=np.int32)
    rows_slab[perm] = rows
    # dropped-slot rows must NOT be relied on being zero: poison them
    dead = np.setdiff1d(np.arange(r_slab), perm)
    rows_slab[dead] = rng.standard_normal((len(dead), 9)).astype(np.float32)

    out = np.asarray(
        jax.jit(gather_reduce_rows)(
            jnp.asarray(rows_slab), jnp.asarray(sorted_e),
            jnp.asarray(seg_lo), jnp.asarray(seg_hi),
        )
    )
    ref = np.add.reduceat(rows.astype(np.float64), seg_lo)
    scale = np.abs(ref).max()
    err = np.abs(out - ref).max() / scale
    assert err < 2e-5, err


def test_gather_demoted_above_cap_threshold():
    """Above GATHER_REDUCE_MAX_R the gather path auto-demotes to the
    live-bound scatter (the inversion sort scales with the STATIC cap —
    generous-cap protocol configs measured 40 ms/it slower; BENCH.md r4).
    Grads must be BIT-IDENTICAL to gather_reduce=False at the same cap."""
    from omnigs_tpu.ops.rasterize import GATHER_REDUCE_MAX_R

    params = random_cloud(jax.random.PRNGKey(3), 64)
    base = dict(
        max_instances=GATHER_REDUCE_MAX_R + (1 << 16),
        backend="pallas",
        interpret=True,
        tile_culling=True,
    )
    g_scatter = _grads(params, RasterConfig(**base))
    g_gather = _grads(params, RasterConfig(gather_reduce=True, **base))
    for a, b in zip(g_scatter, g_gather):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
