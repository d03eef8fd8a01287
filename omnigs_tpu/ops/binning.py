"""Static-shape tile binning: duplicate-with-keys → sort → per-tile ranges.

TPU-native replacement for the reference's dynamic binning pipeline
(`/root/reference/cuda_rasterizer/rasterizer_impl.cu:94-167,305-395`): the
reference prefix-sums `tiles_touched`, copies the total to the host, reallocs
a binning buffer, scatters (tileId<<32 | depthBits) keys, and CUB-radix-sorts
them. None of that maps to XLA (host sync + dynamic shapes), so here:

* The instance buffer has a *static* capacity ``max_instances`` (R). Instance
  slot j maps to its source Gaussian with a **scatter-ones + cumsum** over
  the exclusive prefix of `tiles_touched` — semantically identical to a
  searchsorted, but one small scatter + one cumsum instead of log₂(P) chained
  2M-element gathers (measured ~20× faster on TPU).
* Per-Gaussian state needed per instance (rect, depth) is packed into one
  (P, 8) row table and fetched with a single row gather — TPU gathers of
  contiguous rows run ~9× faster than per-column gathers.
* Instances are emitted in the same (gaussian-major, then tile-row-major)
  order as `duplicateWithKeys` (`rasterizer_impl.cu:94-140`), and the sort is
  a stable lexicographic `lax.sort` on (tile, depth), so the composited
  order — including depth ties — matches the reference's stable radix sort.
* For the Pallas path, per-tile slabs are re-laid to chunk-aligned offsets
  (TPU DMA lane alignment) using the same scatter+cumsum ownership trick.
* The XLA path densifies to a (num_tiles, tile_cap) id matrix (+ mask);
  overflow beyond ``tile_cap`` is *counted and reported*, never silent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from omnigs_tpu.ops.preprocess import Preprocessed


class BinnedInstances(NamedTuple):
    """Instance-major binning result (the Pallas kernels' native layout)."""

    sorted_g: jnp.ndarray  # (R,) int32 gaussian index per instance
    starts: jnp.ndarray  # (num_tiles,) int32 first instance of each tile
    counts: jnp.ndarray  # (num_tiles,) int32 instances per tile
    num_instances: jnp.ndarray  # () int32 total emitted instances
    truncated: jnp.ndarray  # () int32 instances dropped by max_instances
    # emission bookkeeping (aligned path only) for the segment-diff gradient
    # reduction: slab position → emission slot, and per-Gaussian emission
    # segment [seg_lo, seg_hi)
    sorted_e: jnp.ndarray | None = None  # (R,) int32, sentinel for ghosts
    seg_lo: jnp.ndarray | None = None  # (P,) int32
    seg_hi: jnp.ndarray | None = None  # (P,) int32
    # depth-presorted packed-key binning (`bin_instances_packed`) only:
    # sorted_g holds DEPTH RANKS; true gaussian id = perm[rank]
    perm: jnp.ndarray | None = None  # (P,) int32 depth order
    inv_perm: jnp.ndarray | None = None  # (P,) int32 rank of each id
    # the sorted packed keys themselves (tile << RANK_BITS | rank) — the
    # segmented relay gathers these to get rank AND source-tile validity
    # from one payload
    sorted_key: jnp.ndarray | None = None  # (R,) uint32


class BinnedTiles(NamedTuple):
    tile_ids: jnp.ndarray  # (num_tiles, tile_cap) int32 gaussian indices
    tile_mask: jnp.ndarray  # (num_tiles, tile_cap) bool
    tile_counts: jnp.ndarray  # (num_tiles,) int32 true per-tile instance count
    num_instances: jnp.ndarray  # () int32 total emitted instances
    overflow: jnp.ndarray  # () int32 instances dropped by tile_cap
    truncated: jnp.ndarray  # () int32 instances dropped by max_instances


def _owner_of_slot(boundaries: jnp.ndarray, num_slots: int) -> jnp.ndarray:
    """For non-decreasing ``boundaries`` (one per owner), return per-slot
    owner index = (# boundaries ≤ j) − 1 — searchsorted-right semantics via
    scatter + cumsum (fast path for huge slot counts on TPU)."""
    marks = (
        jnp.zeros((num_slots,), jnp.int32)
        .at[boundaries]
        .add(1, mode="drop")
    )
    return jnp.cumsum(marks) - 1


def _sorted_histogram(keys: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    """Per-bin counts of int32 ``keys`` ∈ [0, num_bins] via a single-operand
    sort + vectorized binary search. A scatter-add histogram costs ~16 µs per
    1k rows on TPU (scalar path); one 1-key sort of millions of rows is ~3 ms."""
    skeys = jax.lax.sort((keys,), num_keys=1, is_stable=False)[0]
    bins = jnp.arange(num_bins + 1, dtype=jnp.int32)
    edges = jnp.searchsorted(skeys, bins, side="left").astype(jnp.int32)
    return edges[1:] - edges[:-1]


MASK_TILES = 64  # pre-emission survivor bitmask width (2 int32 words)

# sorted_e sentinel for slab slots that carry no survivor (ghosts, dead,
# out-of-window): sorts after every real survivor rank (< 2^24) in the
# gradient-reduction inversion sort
E_SENTINEL = 1 << 30


def _gather_1d(vals: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``vals[idx]`` for a 1-D table and a large index batch, vector-path.

    A standalone 1-D gather lowers to the TPU scalar pipeline (~22 ns/row —
    45 ms at 2M rows, BENCH.md); reshaping ``vals`` to (N/128, 128) turns it
    into a row gather (vector path, ~2-4 ns/row) plus a one-hot lane select.
    """
    n = vals.shape[0]
    n_pad = -(-n // 128) * 128
    v2 = jnp.pad(vals, (0, n_pad - n)).reshape(-1, 128)
    rows = v2[idx // 128]  # (B, 128) row gather
    sel = (idx % 128)[:, None] == jnp.arange(128, dtype=idx.dtype)[None, :]
    return jnp.sum(jnp.where(sel, rows, 0), axis=1)


def _emission_segments(keep: jnp.ndarray, offsets: jnp.ndarray,
                       tiles: jnp.ndarray, max_instances: int):
    """Survivor-rank bookkeeping for the gather-based gradient reduction.

    ``keep`` marks emission slots that survive into the slab. Returns
    (e, ksum_seg_lo, seg_hi): ``e`` is each slot's *survivor rank*
    (cumsum(keep)−1; E_SENTINEL for dropped slots) — carried through the
    main sort as a payload, it lets the backward invert slab→rank with one
    cheap 1-key sort and reduce instance gradients per Gaussian with a
    cumsum + segment diff instead of a serial scatter (pallas_raster._ci_bwd).
    A Gaussian's survivors are contiguous in rank (its emission slots are
    contiguous and ranking preserves order), so its segment is
    [ksum[first slot], ksum[end slot]).
    """
    ks = jnp.cumsum(keep.astype(jnp.int32))
    e = jnp.where(keep, ks - 1, E_SENTINEL)
    ksum = jnp.concatenate([jnp.zeros((1,), jnp.int32), ks])
    lo = jnp.minimum(offsets, max_instances)
    hi = jnp.minimum(offsets + tiles, max_instances)
    return e, _gather_1d(ksum, lo), _gather_1d(ksum, hi)


def _precull_masks(prep: Preprocessed, grid_x: int):
    """Per-Gaussian 64-bit bitmask of rect SUPERBLOCKS that survive the
    ellipse–box cull, plus per-Gaussian block geometry (sx, sy, wb) and the
    emission budget.

    Evaluating the cull at the Gaussian level (P rows) instead of on emitted
    instances (R rows) lets the emission budget itself shrink by the culled
    fraction — the expansion gather and the sort all scale with R.

    Rects with ≤ MASK_TILES tiles get one bit per TILE (sx = sy = 1 — the
    cull is exact and emission = surviving count). Bigger rects tile into at
    most 8×8 superblocks of sx×sy tiles (sx = ceil(w/8), sy = ceil(h/8) —
    per-axis factors so elongated rects don't square off); a bit covers a
    block and is set iff the max α over the block's pixel box can reach
    1/255 — CONSERVATIVE (block box ⊇ any tile box ⇒ block qmin ≤ tile
    qmin), so no survivor is ever dropped; the expansion's exact per-tile
    re-test removes the rest. Each surviving block emits a uniform sx·sy
    slots (edge-of-rect overhang culled by the in-rect test) so the slot →
    block mapping stays a k-th-set-bit popcount. This replaces the round-2/3
    "emit-all" path for big Gaussians, which emitted full rect areas: at the
    bench workload 46% of all emission came from 2.6% of Gaussians and the
    re-test then discarded 82% of it — after paying for the gather + sort.
    """
    from omnigs_tpu.ops.preprocess import TILE

    rect = prep.rect
    x0, y0 = rect[:, 0:1], rect[:, 1:2]
    w = jnp.maximum(rect[:, 2:3] - x0, 1)
    h = jnp.maximum(rect[:, 3:4] - y0, 1)
    area = prep.tiles_touched[:, None]  # w·h for emitted Gaussians, 0 culled
    small = area <= MASK_TILES
    sx = jnp.where(small, 1, (w + 7) // 8)
    sy = jnp.where(small, 1, (h + 7) // 8)
    wb = (w + sx - 1) // sx  # ≤ 8 for big, = w for small
    hb = (h + sy - 1) // sy
    nb = wb * hb  # ≤ MASK_TILES by construction
    mx, my = prep.means2d[:, 0:1], prep.means2d[:, 1:2]
    cA, cB, cC = prep.conic[:, 0:1], prep.conic[:, 1:2], prep.conic[:, 2:3]
    op = prep.opacity[:, None]
    # one (P, MASK_TILES) pass — a 64×-unrolled per-bit loop emits 64 copies
    # of this op chain into the HLO (compile-time pressure on the wedge-prone
    # remote compiler) for identical output (VERDICT r2 weak #5)
    b = jnp.arange(MASK_TILES, dtype=jnp.int32)[None, :]
    bx = jnp.remainder(b, wb)
    by = b // wb
    px0 = ((x0 + bx * sx) * TILE).astype(jnp.float32)
    py0 = ((y0 + by * sy) * TILE).astype(jnp.float32)
    ex = (sx * TILE - 1).astype(jnp.float32)
    ey = (sy * TILE - 1).astype(jnp.float32)
    qmin = _min_quad_over_box(
        cA, cB, cC,
        px0 - mx, px0 + ex - mx,
        py0 - my, py0 + ey - my,
    )
    keep = (
        (b < nb) & (area > 0)
        & (op * jnp.exp(-0.5 * qmin) >= 1.0 / 255.0)
    )
    bit = keep.astype(jnp.int32) << (b % 32)
    # distinct bits per lane ⇒ sum ≡ bitwise-or
    lo = jnp.sum(jnp.where(b < 32, bit, 0), axis=1)
    hi = jnp.sum(jnp.where(b >= 32, bit, 0), axis=1)
    count = jax.lax.population_count(lo) + jax.lax.population_count(hi)
    tiles_eff = (count * (sx * sy)[:, 0]).astype(jnp.int32)
    # The emission layout (offsets from tiles_eff) and the expansion's
    # k-th-set-bit mapping (mask table columns) MUST agree bit-for-bit.
    # Under jit, XLA can clone this float chain (the qmin threshold test)
    # into both consumer fusions with divergent rounding — the same
    # layout-invariant bug class as the rect barrier in preprocess.py
    # (caught on chip by check_jit_parity: 0.196 image error).
    return jax.lax.optimization_barrier(
        (lo, hi, tiles_eff, sx[:, 0], sy[:, 0], wb[:, 0])
    )


def _hier_decode(x0, y0, x1, y1, sx, sy, wb, lo_m, hi_m, local):
    """Emission slot ``local`` (within its Gaussian) → (tx, ty, in_rect)
    under the superblock mask: block = k-th set bit of (lo, hi) with
    k = local // (sx·sy); tile offset inside the block = (within % sx,
    within // sx). Edge-block tiles overhanging the rect return
    in_rect=False — they exist only to keep per-block emission uniform so
    the block mapping stays a popcount. For sx = sy = 1 (small Gaussians)
    this reduces exactly to the per-tile k-th-set-bit decode."""
    q = sx * sy
    blk = local // q
    within = local - blk * q
    b = _kth_set_bit(lo_m, hi_m, blk)
    wx = within % sx
    wy = within // sx
    tx = x0 + (b % wb) * sx + wx
    ty = y0 + (b // wb) * sy + wy
    return tx, ty, (tx < x1) & (ty < y1)


def _kth_set_bit(lo: jnp.ndarray, hi: jnp.ndarray, k: jnp.ndarray):
    """Position of the k-th (0-based, ascending) set bit of the 64-bit mask
    (lo, hi) — 5-step binary search on popcounts, fully vectorized. For an
    all-ones mask this is the identity (k), which unifies the emit-all path.
    Arithmetic right shifts are safe: sign-extension bits sit above every
    low-window popcount inspected afterwards."""
    nlo = jax.lax.population_count(lo)
    use_hi = k >= nlo
    word = jnp.where(use_hi, hi, lo)
    kk = jnp.where(use_hi, k - nlo, k)
    b = jnp.where(use_hi, 32, 0)
    for shift in (16, 8, 4, 2, 1):
        cnt = jax.lax.population_count(word & ((1 << shift) - 1))
        go = kk >= cnt
        word = jnp.where(go, word >> shift, word)
        kk = jnp.where(go, kk - cnt, kk)
        b = b + jnp.where(go, shift, 0)
    return b


def bin_instances(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_instances: int,
    tile_lo=0,
    n_tiles: int | None = None,
    tile_cull: bool = False,
    with_emission: bool = False,
) -> BinnedInstances:
    """Duplicate-with-keys + sort + tile ranges, instance-major.

    Bins into the tile window [tile_lo, tile_lo + n_tiles). ``n_tiles`` is
    static (defaults to the whole grid); ``tile_lo`` may be a traced device
    offset — this is how the tile axis shards across a mesh (each device
    bins only its owned tile slice).

    This is the **compact** layout: per-tile segments are tightly packed
    (``starts[t+1] == starts[t] + counts[t]``), with no alignment padding —
    the Pallas kernels handle unaligned segment starts by DMA-ing the
    containing 128-aligned chunk and masking the head lanes. Compared to the
    ghost-aligned layout (`bin_instances_aligned`) this keeps ~tiles·chunk
    rows out of the sort, the slab gather, and the gradient scatter.

    ``tile_cull=True`` drops every (gaussian, tile) instance whose maximum α
    over the tile's pixel box is provably < 1/255 (see
    `bin_instances_aligned` for the exactness argument).

    ``with_emission=True`` additionally carries each surviving instance's
    *survivor rank* through the sort (`_emission_segments`) so the backward
    can reduce instance gradients per Gaussian by gather + cumsum + segment
    diff instead of a serial scatter-add.
    """
    num_tiles = n_tiles if n_tiles is not None else grid_x * grid_y
    if tile_cull:
        # pre-emission culling: only (gaussian, block-survivor) slots are
        # emitted, so max_instances can be sized near the survivor count
        mlo, mhi, tiles, c_sx, c_sy, c_wb = _precull_masks(prep, grid_x)
    else:
        tiles = prep.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(tiles) - tiles  # exclusive prefix sum
    total = offsets[-1] + tiles[-1]

    # Instance slot → source Gaussian (vectorized duplicate-with-keys).
    g = jnp.clip(_owner_of_slot(offsets, max_instances), 0, tiles.shape[0] - 1)

    # One row gather for everything the expansion needs, *including the
    # per-Gaussian emission offset* (as an exact-below-2^24 f32 value — NOT a
    # bitcast: int32 bits < 2^23 are f32 denormals, which the TPU transpose
    # below flushes to zero): a standalone 1-D ``offsets[g]`` gather lowers
    # to the TPU scalar path and costs ~45 ms at 2M instances; as a table
    # column it is free. The survivor bitmasks ride as four 16-bit-valued
    # f32 columns (0..65535 — exact, and never denormal) for the same reason.
    assert max_instances < 1 << 24, "offsets ride an f32 column exactly"
    parts = [
        prep.rect.astype(jnp.float32),
        prep.depths[:, None],
        offsets.astype(jnp.float32)[:, None],
    ]
    if tile_cull:
        parts += [
            jnp.stack(
                [
                    (mlo & 0xFFFF).astype(jnp.float32),
                    ((mlo >> 16) & 0xFFFF).astype(jnp.float32),
                    (mhi & 0xFFFF).astype(jnp.float32),
                    ((mhi >> 16) & 0xFFFF).astype(jnp.float32),
                ],
                axis=-1,
            ),
            jnp.stack([c_sx, c_sy, c_wb], axis=-1).astype(jnp.float32),
            prep.means2d,
            prep.conic,
            prep.opacity[:, None],
        ]
    table = jnp.concatenate(parts, axis=-1)
    ncol = table.shape[1]

    def _expand_chunk(off, g_c):
        """Expansion for one CH_E-slot window starting at ``off`` (traced):
        gather the per-Gaussian rows and map local slot → (tile, depth)."""
        ch = g_c.shape[0]
        j = off + jnp.arange(ch, dtype=jnp.int32)
        alive = j < total
        # per-chunk column-major flatten: one small physical transpose so
        # the per-column reads below are contiguous (column slices of a
        # row-major lane-padded table re-scan ~10× the data)
        flat = jax.lax.optimization_barrier(table[g_c].T.reshape(-1))
        cols = [
            jax.lax.dynamic_slice_in_dim(flat, c * ch, ch)
            for c in range(ncol)
        ]
        x0 = cols[0].astype(jnp.int32)
        y0 = cols[1].astype(jnp.int32)
        local = j - cols[5].astype(jnp.int32)
        if tile_cull:
            # local k → k-th surviving superblock, tile within block
            lo_m = cols[6].astype(jnp.int32) | (
                cols[7].astype(jnp.int32) << 16
            )
            hi_m = cols[8].astype(jnp.int32) | (
                cols[9].astype(jnp.int32) << 16
            )
            tx, ty, in_rect = _hier_decode(
                x0, y0,
                cols[2].astype(jnp.int32), cols[3].astype(jnp.int32),
                cols[10].astype(jnp.int32), cols[11].astype(jnp.int32),
                cols[12].astype(jnp.int32), lo_m, hi_m, local,
            )
        else:
            width = jnp.maximum(cols[2].astype(jnp.int32) - x0, 1)
            tx = x0 + local % width
            ty = y0 + local // width
        tid = ty * grid_x + tx - tile_lo  # window-local tile index
        keep = alive & (tid >= 0) & (tid < num_tiles)
        if tile_cull:
            from omnigs_tpu.ops.preprocess import TILE

            # exact per-tile re-test (the block mask is conservative)
            mx, my = cols[13], cols[14]
            cA, cB, cC = cols[15], cols[16], cols[17]
            op = cols[18]
            px0 = (tx * TILE).astype(jnp.float32)
            py0 = (ty * TILE).astype(jnp.float32)
            qmin = _min_quad_over_box(
                cA, cB, cC,
                px0 - mx, px0 + (TILE - 1) - mx,
                py0 - my, py0 + (TILE - 1) - my,
            )
            keep = (
                keep & in_rect
                & (op * jnp.exp(-0.5 * qmin) >= 1.0 / 255.0)
            )
        tid = jnp.where(keep, tid, num_tiles)
        depth = jnp.where(keep, cols[4], jnp.inf)
        return tid, depth

    # Live-bound expansion: a dynamic-trip while_loop over CH_E-slot chunks
    # stops at the emitted total, so the gather/expansion cost scales with
    # LIVE instances, not the static cap (nearly-empty early-training slabs
    # and generous caps no longer pay full price). Dead slots keep their
    # initialized sentinels (tile=num_tiles, depth=+inf) — exactly what the
    # full-width expansion produced for them.
    CH_E = 1 << 16
    n_full = max_instances // CH_E
    if n_full * CH_E != max_instances or n_full <= 1:
        # ragged cap (tests use tiny/odd max_instances): single full pass
        tile_id, depth = _expand_chunk(jnp.int32(0), g)
    else:
        n_chunks = jnp.minimum((total + CH_E - 1) // CH_E, n_full)

        def _body(carry):
            tid_a, dep_a, i = carry
            off = i * CH_E
            g_c = jax.lax.dynamic_slice(g, (off,), (CH_E,))
            tid_c, dep_c = _expand_chunk(off, g_c)
            tid_a = jax.lax.dynamic_update_slice(tid_a, tid_c, (off,))
            dep_a = jax.lax.dynamic_update_slice(dep_a, dep_c, (off,))
            return tid_a, dep_a, i + 1

        tile_id, depth, _ = jax.lax.while_loop(
            lambda c: c[2] < n_chunks,
            _body,
            (
                jnp.full((max_instances,), num_tiles, jnp.int32),
                jnp.full((max_instances,), jnp.inf, jnp.float32),
                jnp.int32(0),
            ),
        )
    # materialize once so XLA cannot clone the expansion chain into several
    # consumer fusions that round differently (see bin_instances_aligned)
    tile_id, depth, g = jax.lax.optimization_barrier((tile_id, depth, g))

    sorted_e = seg_lo = seg_hi = None
    if with_emission:
        # dead/culled slots carry the sentinel tile id — `keep` is free here
        keep = tile_id < num_tiles
        e, seg_lo, seg_hi = _emission_segments(
            keep, offsets, tiles, max_instances
        )
        sorted_tile, _, sorted_g, sorted_e = jax.lax.sort(
            (tile_id, depth, g, e), num_keys=2, is_stable=True
        )
    else:
        sorted_tile, _, sorted_g = jax.lax.sort(
            (tile_id, depth, g), num_keys=2, is_stable=True
        )

    # Per-tile ranges: few queries over a big sorted table — binary search is
    # cheap here (num_tiles lookups, not max_instances).
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    counts = ends - starts

    return BinnedInstances(
        sorted_g=sorted_g,
        starts=starts,
        counts=counts,
        num_instances=jnp.sum(counts),
        truncated=jnp.maximum(total - max_instances, 0),
        sorted_e=sorted_e,
        seg_lo=seg_lo,
        seg_hi=seg_hi,
    )


RANK_BITS = 19  # depth-rank bits in the packed sort key (P ≤ 2^19)


def bin_instances_packed(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_instances: int,
    tile_lo=0,
    n_tiles: int | None = None,
    tile_cull: bool = False,
    with_emission: bool = False,
) -> BinnedInstances:
    """Compact binning with a depth-presort and a single packed sort key.

    Depth is per-GAUSSIAN (view-space z, `preprocess`), not per-instance — so
    stable-sorting the P Gaussians by depth ONCE (cheap: P ≪ R rows) makes
    every tile's gaussian-major emission sequence depth-ordered by
    construction. The per-instance sort then needs no depth key at all: the
    key is the packed uint32 ``tile << RANK_BITS | depth_rank`` — *unique*
    per instance (each (gaussian, tile) pair emits at most once), so an
    unstable 1-key sort reproduces the reference's stable (tile, depthbits)
    radix order exactly (ties in depth keep original gaussian order via the
    stable presort), while moving one array instead of three. ``sorted_g``
    holds depth RANKS (decoded from the key bits for free); the caller maps
    rank → gaussian with the returned ``perm`` (one P-row gather) and maps
    reduced gradients back with ``inv_perm``.

    Replaces `/root/reference/cuda_rasterizer/rasterizer_impl.cu:94-167`
    (duplicateWithKeys + 64-bit radix sort) like `bin_instances`, at roughly
    half the sort traffic. Requires P ≤ 2^RANK_BITS and
    num_tiles < 2^(32−RANK_BITS) − 1 (asserted); callers fall back to
    `bin_instances` outside those bounds.

    Truncation semantics: when emission exceeds ``max_instances`` the tail
    is dropped in DEPTH order (farthest Gaussians first) rather than
    `bin_instances`' original-id order — still deterministic and counted in
    ``truncated``, and bit-identical to `bin_instances` whenever
    truncated == 0 (the operating regime; tests/test_packed_binning.py).
    """
    num_tiles = n_tiles if n_tiles is not None else grid_x * grid_y
    P = prep.depths.shape[0]
    assert P <= (1 << RANK_BITS), (P, RANK_BITS)
    assert num_tiles < (1 << (32 - RANK_BITS)) - 1, num_tiles
    assert max_instances < 1 << 24, "offsets ride an f32 column exactly"

    if tile_cull:
        mlo, mhi, tiles, c_sx, c_sy, c_wb = _precull_masks(prep, grid_x)
    else:
        tiles = prep.tiles_touched.astype(jnp.int32)

    # stable depth presort (ties keep original gaussian order — together
    # with gaussian-major emission this reproduces the reference's stable
    # (tile, depth) sort tie order); tiles rides as a payload so the
    # depth-order cumsum below needs no 1-D gather (scalar path, BENCH.md)
    iota_p = jnp.arange(P, dtype=jnp.int32)
    _, perm, tiles_d = jax.lax.sort(
        (prep.depths, iota_p, tiles), num_keys=1, is_stable=True
    )
    # inverse permutation by sorting back (a P-row sort beats a serial
    # P-row scatter of iota)
    _, inv_perm = jax.lax.sort((perm, iota_p), num_keys=1, is_stable=False)

    offsets_d = jnp.cumsum(tiles_d) - tiles_d
    total = offsets_d[-1] + tiles_d[-1]
    g = jnp.clip(_owner_of_slot(offsets_d, max_instances), 0, P - 1)

    # expansion table built in ORIGINAL order, rows permuted once (row
    # gathers are the vector path; per-column permutes are not), then the
    # depth-order emission offsets appended
    parts = [prep.rect.astype(jnp.float32)]
    if tile_cull:
        parts += [
            jnp.stack(
                [
                    (mlo & 0xFFFF).astype(jnp.float32),
                    ((mlo >> 16) & 0xFFFF).astype(jnp.float32),
                    (mhi & 0xFFFF).astype(jnp.float32),
                    ((mhi >> 16) & 0xFFFF).astype(jnp.float32),
                ],
                axis=-1,
            ),
            jnp.stack([c_sx, c_sy, c_wb], axis=-1).astype(jnp.float32),
            prep.means2d,
            prep.conic,
            prep.opacity[:, None],
        ]
    table = jnp.concatenate(parts, axis=-1)[perm]
    table = jnp.concatenate(
        [table, offsets_d.astype(jnp.float32)[:, None]], axis=-1
    )
    ncol = table.shape[1]
    off_col = ncol - 1

    def _expand_chunk(off, g_c):
        ch = g_c.shape[0]
        j = off + jnp.arange(ch, dtype=jnp.int32)
        alive = j < total
        flat = jax.lax.optimization_barrier(table[g_c].T.reshape(-1))
        cols = [
            jax.lax.dynamic_slice_in_dim(flat, c * ch, ch)
            for c in range(ncol)
        ]
        x0 = cols[0].astype(jnp.int32)
        y0 = cols[1].astype(jnp.int32)
        local = j - cols[off_col].astype(jnp.int32)
        if tile_cull:
            lo_m = cols[4].astype(jnp.int32) | (
                cols[5].astype(jnp.int32) << 16
            )
            hi_m = cols[6].astype(jnp.int32) | (
                cols[7].astype(jnp.int32) << 16
            )
            tx, ty, in_rect = _hier_decode(
                x0, y0, cols[2].astype(jnp.int32), cols[3].astype(jnp.int32),
                cols[8].astype(jnp.int32), cols[9].astype(jnp.int32),
                cols[10].astype(jnp.int32), lo_m, hi_m, local,
            )
        else:
            width = jnp.maximum(cols[2].astype(jnp.int32) - x0, 1)
            tx = x0 + local % width
            ty = y0 + local // width
        tid = ty * grid_x + tx - tile_lo
        keep = alive & (tid >= 0) & (tid < num_tiles)
        if tile_cull:
            from omnigs_tpu.ops.preprocess import TILE

            mx, my = cols[11], cols[12]
            cA, cB, cC = cols[13], cols[14], cols[15]
            op = cols[16]
            px0 = (tx * TILE).astype(jnp.float32)
            py0 = (ty * TILE).astype(jnp.float32)
            qmin = _min_quad_over_box(
                cA, cB, cC,
                px0 - mx, px0 + (TILE - 1) - mx,
                py0 - my, py0 + (TILE - 1) - my,
            )
            keep = (
                keep & in_rect
                & (op * jnp.exp(-0.5 * qmin) >= 1.0 / 255.0)
            )
        tid = jnp.where(keep, tid, num_tiles)
        key = (tid.astype(jnp.uint32) << RANK_BITS) | g_c.astype(jnp.uint32)
        return key

    CH_E = 1 << 16
    n_full = max_instances // CH_E
    dead_key = jnp.uint32(num_tiles) << RANK_BITS
    if n_full * CH_E != max_instances or n_full <= 1:
        key = _expand_chunk(jnp.int32(0), g)
    else:
        n_chunks = jnp.minimum((total + CH_E - 1) // CH_E, n_full)

        def _body(carry):
            key_a, i = carry
            off = i * CH_E
            g_c = jax.lax.dynamic_slice(g, (off,), (CH_E,))
            key_c = _expand_chunk(off, g_c)
            return jax.lax.dynamic_update_slice(key_a, key_c, (off,)), i + 1

        key, _ = jax.lax.while_loop(
            lambda c: c[1] < n_chunks,
            _body,
            (jnp.full((max_instances,), dead_key, jnp.uint32), jnp.int32(0)),
        )
    # materialize once (fusion-clone layout-invariant guard, see
    # bin_instances; key feeds the sort and — with emission — the cumsum)
    key = jax.lax.optimization_barrier(key)

    sorted_e = seg_lo = seg_hi = None
    if with_emission:
        keep = (key >> RANK_BITS) < num_tiles
        e, seg_lo, seg_hi = _emission_segments(
            keep, offsets_d, tiles_d, max_instances
        )
        skey, sorted_e = jax.lax.sort((key, e), num_keys=1, is_stable=False)
    else:
        (skey,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
    sorted_g = (skey & ((1 << RANK_BITS) - 1)).astype(jnp.int32)
    sorted_tile = (skey >> RANK_BITS).astype(jnp.int32)

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    counts = ends - starts

    return BinnedInstances(
        sorted_g=sorted_g,
        starts=starts,
        counts=counts,
        num_instances=jnp.sum(counts),
        truncated=jnp.maximum(total - max_instances, 0),
        sorted_e=sorted_e,
        seg_lo=seg_lo,
        seg_hi=seg_hi,
        perm=perm,
        inv_perm=inv_perm,
        sorted_key=skey,
    )


SEG_GRAN = 8  # segment granularity of the segmented-chunk slab layout


class SegLayout(NamedTuple):
    """8-granular slab re-lay for the segmented-chunk Pallas kernels.

    Every tile's segment is padded to a multiple of SEG_GRAN lanes, so a
    128-lane kernel chunk contains at most 128/SEG_GRAN = 16 distinct tile
    segments — the static bound that makes per-chunk tile windows (scalar
    prefetch + one-hot masks) possible. Pad lanes carry the P-sentinel in
    ``sorted_g8`` (mapped to an all-zero instance row → α = 0 → dead) and
    E_SENTINEL in ``e8``.
    """

    sorted_g8: jnp.ndarray  # (R8,) int32 ranks/ids; == p_sentinel on pads
    e8: jnp.ndarray | None  # (R8,) int32 survivor ranks; E_SENTINEL on pads
    starts8: jnp.ndarray  # (T,) int32 SEG_GRAN-aligned slab8 start per tile
    counts: jnp.ndarray  # (T,) int32 surviving count per tile (post-trim)
    truncated: jnp.ndarray  # () int32 instances dropped by the r8 cap
    live8: jnp.ndarray  # () int32 slab8 high-water mark
    # per-slot ride values for the kernels' per-lane tile windows (exact
    # below 2^24, ride the slab as f32 rows): the owning tile's DENSE
    # (nonempty-enumeration) index and its global tile id. Pad lanes alias
    # their tile's values — harmless, every contribution is α-gated.
    ride_d: jnp.ndarray | None = None  # (R8,) int32 dense tile index
    ride_t: jnp.ndarray | None = None  # (R8,) int32 global tile id


def segment_relay(
    sorted_g: jnp.ndarray,
    sorted_e: jnp.ndarray | None,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    r8: int,
    p_sentinel: int,
    sorted_key: jnp.ndarray | None = None,
) -> SegLayout:
    """Re-lay the compact sorted slab to SEG_GRAN-aligned per-tile segments.

    The compact layout packs tile segments tightly (`bin_instances`), which
    leaves ~47% of kernel chunk-lanes masked at typical workloads because
    each tile restarts its own chunk walk (BENCH.md r4 tile-size analysis).
    The segmented kernels instead walk the slab linearly, one pass per
    128-lane chunk, with per-lane tile windows — requiring only that no
    chunk spans more than 16 segments, i.e. SEG_GRAN-aligned starts.

    Cost: two telescoped scatter+cumsum passes for the per-slot source
    mapping plus one live-bound chunked `_gather_1d` per payload (g, and e
    when the gather reduction is on) — all O(R8) bandwidth, no sort.

    Tiles whose padded segment would cross ``r8`` are dropped
    deterministically and counted (same rule as `RasterConfig.aligned_cap`).
    """
    assert r8 % 128 == 0, r8
    r = sorted_g.shape[0]
    padded = ((counts + SEG_GRAN - 1) // SEG_GRAN) * SEG_GRAN
    starts8 = jnp.cumsum(padded) - padded
    fits = starts8 + padded <= r8
    truncated = jnp.sum(jnp.where(fits, 0, counts))
    counts8 = jnp.where(fits, counts, 0)
    padded8 = jnp.where(fits, padded, 0)
    live8 = jnp.max(starts8 + padded8)

    # per-slot fields via telescoped scatter(delta at segment start)+cumsum:
    # for any per-tile value v, scattering v[t] − v[t−1] at starts8[t] and
    # prefix-summing yields v[tile(j)] at every slot j (empty/dropped tiles
    # share their successor's start — the .add accumulates the deltas).
    def _at_slots(v):
        dv = jnp.concatenate([v[:1], v[1:] - v[:-1]])
        return jnp.cumsum(
            jnp.zeros((r8,), jnp.int32).at[starts8].add(dv, mode="drop")
        )

    shift_at = _at_slots(starts8 - starts)  # src = j − shift
    use_key = sorted_key is not None and sorted_e is None
    if not use_key:
        end_at = _at_slots(starts8 + counts8)  # valid = j < end
    # per-lane window metadata for the segmented kernels (dense tile index
    # in the nonempty enumeration + global tile id), PACKED into one
    # telescoped cumsum: both fields are < 2^13 non-negative prefix
    # values, so the packed deltas accumulate without cross-field carries.
    # Empty/dropped tiles alias their predecessor — all α-gated dead.
    # With the packed-key payload (`use_key`), trimmed tiles carry the
    # num_tiles sentinel so their lanes fail the source-tile validity test
    # (their compact rows still exist and would otherwise resurrect).
    t = counts.shape[0]
    assert t < (1 << 13), t
    pos = jnp.cumsum((counts8 > 0).astype(jnp.int32)) - 1
    tid_vals = jnp.arange(t, dtype=jnp.int32)
    if use_key:
        tid_vals = jnp.where(fits, tid_vals, t)
    packed_dt = _at_slots(
        (jnp.clip(pos, 0, t) << 13) | tid_vals
    )
    ride_d = packed_dt >> 13
    ride_t = packed_dt & ((1 << 13) - 1)
    j = jnp.arange(r8, dtype=jnp.int32)
    src_raw = j - shift_at
    src = jnp.clip(src_raw, 0, r - 1)
    if use_key:
        # validity comes from the gathered key itself: a lane is live iff
        # its source row's tile field matches its own tile ride — no
        # second telescoped cumsum, single payload gather. (The src < r
        # guard covers an exactly-full compact array whose clamped tail
        # row would otherwise tile-match the last tile.) Keys stay uint32
        # end-to-end: tile << 19 exceeds int31.
        CH = 1 << 16

        def _key_gather(src_c, srcraw_c, ridet_c):
            kv = _gather_1d(sorted_key, src_c)
            ok = ((kv >> RANK_BITS) == ridet_c.astype(jnp.uint32)) & (
                srcraw_c < r
            )
            return jnp.where(
                ok,
                (kv & ((1 << RANK_BITS) - 1)).astype(jnp.int32),
                jnp.int32(p_sentinel),
            )

        if r8 % CH != 0 or r8 // CH <= 1:
            sorted_g8 = _key_gather(src, src_raw, ride_t)
        else:
            n_chunks = jnp.minimum((live8 + CH - 1) // CH, r8 // CH)

            def _body(carry):
                g_a, i = carry
                off = i * CH
                g_c = _key_gather(
                    jax.lax.dynamic_slice(src, (off,), (CH,)),
                    jax.lax.dynamic_slice(src_raw, (off,), (CH,)),
                    jax.lax.dynamic_slice(ride_t, (off,), (CH,)),
                )
                return (
                    jax.lax.dynamic_update_slice(g_a, g_c, (off,)),
                    i + 1,
                )

            sorted_g8, _ = jax.lax.while_loop(
                lambda c: c[1] < n_chunks,
                _body,
                (jnp.full((r8,), p_sentinel, jnp.int32), jnp.int32(0)),
            )
        return SegLayout(
            sorted_g8=sorted_g8,
            e8=None,
            starts8=starts8,
            counts=counts8,
            truncated=truncated,
            live8=live8,
            ride_d=ride_d,
            ride_t=ride_t,
        )
    valid = j < end_at

    # live-bound chunked payload gather: one fused row-gather pass for
    # both payloads (g, and e when the gather reduction is on) — the
    # row-fetch dominates `_gather_1d`, so fetching a double-width row
    # once is ~40% cheaper than two passes
    with_e = sorted_e is not None
    n128 = -(-r // 128) * 128
    gtab = jnp.pad(sorted_g, (0, n128 - r)).reshape(-1, 128)
    if with_e:
        etab = jnp.pad(sorted_e, (0, n128 - r)).reshape(-1, 128)
        gtab = jnp.concatenate([gtab, etab], axis=1)  # (n128/128, 256)

    def _fused_gather(src_c, valid_c):
        rows = gtab[src_c // 128]  # (CH, 128) or (CH, 256) row gather
        sel = (src_c % 128)[:, None] == jnp.arange(
            128, dtype=src_c.dtype
        )[None, :]
        g_v = jnp.sum(jnp.where(sel, rows[:, :128], 0), axis=1)
        g_o = jnp.where(valid_c, g_v, jnp.int32(p_sentinel))
        if not with_e:
            return g_o, None
        e_v = jnp.sum(jnp.where(sel, rows[:, 128:], 0), axis=1)
        return g_o, jnp.where(valid_c, e_v, jnp.int32(E_SENTINEL))

    CH = 1 << 16
    if r8 % CH != 0 or r8 // CH <= 1:
        sorted_g8, e8 = _fused_gather(src, valid)
    else:
        n_chunks = jnp.minimum((live8 + CH - 1) // CH, r8 // CH)

        def _body(carry):
            g_a, e_a, i = carry
            off = i * CH
            src_c = jax.lax.dynamic_slice(src, (off,), (CH,))
            val_c = jax.lax.dynamic_slice(valid, (off,), (CH,))
            g_c, e_c = _fused_gather(src_c, val_c)
            g_a = jax.lax.dynamic_update_slice(g_a, g_c, (off,))
            if with_e:
                e_a = jax.lax.dynamic_update_slice(e_a, e_c, (off,))
            return g_a, e_a, i + 1

        sorted_g8, e8, _ = jax.lax.while_loop(
            lambda c: c[2] < n_chunks,
            _body,
            (
                jnp.full((r8,), p_sentinel, jnp.int32),
                jnp.full((r8,), E_SENTINEL, jnp.int32)
                if with_e
                else jnp.zeros((1,), jnp.int32),
                jnp.int32(0),
            ),
        )
    if not with_e:
        e8 = None
    return SegLayout(
        sorted_g8=sorted_g8,
        e8=e8,
        starts8=starts8,
        counts=counts8,
        truncated=truncated,
        live8=live8,
        ride_d=ride_d,
        ride_t=ride_t,
    )


def tile_cover_counts(
    rect: jnp.ndarray,
    emit_mask: jnp.ndarray,
    grid_x: int,
    grid_y: int,
    tile_lo=0,
    n_tiles: int | None = None,
) -> jnp.ndarray:
    """Exact per-tile instance counts without touching instances: scatter the
    four signed rect corners of each emitted Gaussian onto a (gy+1, gx+1)
    grid and 2D-prefix-sum — counts[t] = #rects covering tile t. O(P)
    scatter into a tiny grid instead of an O(R) histogram."""
    num_tiles = n_tiles if n_tiles is not None else grid_x * grid_y
    x0, y0, x1, y1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    one = jnp.where(emit_mask, 1, 0).astype(jnp.int32)
    grid = jnp.zeros((grid_y + 1, grid_x + 1), jnp.int32)
    grid = grid.at[y0, x0].add(one)
    grid = grid.at[y0, x1].add(-one)
    grid = grid.at[y1, x0].add(-one)
    grid = grid.at[y1, x1].add(one)
    counts2d = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:grid_y, :grid_x]
    flat = counts2d.reshape(-1)
    return jax.lax.dynamic_slice_in_dim(flat, tile_lo, num_tiles)


def _min_quad_over_box(A, B, C, u0, u1, v0, v1):
    """Exact min of q(u,v) = A·u² + 2B·u·v + C·v² over the box
    [u0,u1]×[v0,v1] (A,C ≥ 0, psd). The constrained minimum is 0 if the
    origin is inside, else it lies on one of the four edges, each a clamped
    1D quadratic — closed form, ~30 flops."""
    eps = 1e-12
    inside = (u0 <= 0.0) & (u1 >= 0.0) & (v0 <= 0.0) & (v1 >= 0.0)

    def q(u, v):
        return A * u * u + 2.0 * B * u * v + C * v * v

    # edges u = u0 / u = u1: min over v at v* = -B·u/C clamped
    vs0 = jnp.clip(-B * u0 / jnp.maximum(C, eps), v0, v1)
    vs1 = jnp.clip(-B * u1 / jnp.maximum(C, eps), v0, v1)
    # edges v = v0 / v = v1: min over u at u* = -B·v/A clamped
    us0 = jnp.clip(-B * v0 / jnp.maximum(A, eps), u0, u1)
    us1 = jnp.clip(-B * v1 / jnp.maximum(A, eps), u0, u1)
    qmin = jnp.minimum(
        jnp.minimum(q(u0, vs0), q(u1, vs1)),
        jnp.minimum(q(us0, v0), q(us1, v1)),
    )
    return jnp.where(inside, 0.0, qmin)


def bin_instances_aligned(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_instances: int,
    chunk: int,
    tile_lo=0,
    n_tiles: int | None = None,
    with_emission: bool = False,
    tile_cull: bool = False,
) -> BinnedInstances:
    """One-pass aligned binning: ghost instances pad every tile's run to a
    multiple of ``chunk``, so the *sorted array itself* is the chunk-aligned
    slab layout the Pallas kernels DMA from — no post-sort re-lay gathers.

    Ghosts carry depth=+∞ so they sort after their tile's real instances
    (and are masked in-kernel by the true count). Per-tile counts come from
    a 1-key mini-sort histogram of the emitted tile ids *before* the main
    sort; to keep them consistent with the emitted instances under capacity
    truncation, emission is cut at the first Gaussian whose instance range
    would cross ``max_instances`` (the whole suffix is dropped —
    deterministic, counted in `truncated`). Output arrays have length
    max_instances + num_tiles·chunk, but all live segments occupy a compact
    prefix (see RasterConfig.aligned_cap).

    ``tile_cull=True`` additionally drops every (gaussian, tile) instance
    whose *maximum* α over the tile's pixel box is provably < 1/255 — the
    exact ellipse–box test the reference's rect binning skips
    (`rasterizer_impl.cu:94-140` bins the full bounding rect). Such
    instances satisfy the kernel's α ≥ 1/255 skip for every pixel, so the
    rendered image and final_T are unchanged; only `n_contrib`'s
    position-based ranks shift (they count composited slots, reference
    semantics counts all fetched instances). Culled instances leave the
    tile window entirely, so segments are sized by surviving counts.
    """
    num_tiles = n_tiles if n_tiles is not None else grid_x * grid_y
    if tile_cull:
        # pre-emission culling (see `bin_instances`)
        mlo, mhi, tiles, c_sx, c_sy, c_wb = _precull_masks(prep, grid_x)
    else:
        tiles = prep.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(tiles) - tiles
    total = offsets[-1] + tiles[-1]

    # contiguous-prefix truncation
    overflow = (offsets + tiles > max_instances).astype(jnp.int32)
    kept = jnp.cumsum(overflow) == 0
    tiles_eff = jnp.where(kept, tiles, 0)
    total_eff = jnp.sum(tiles_eff)

    # real instances — one row gather for everything the expansion needs,
    # including the per-Gaussian emission offset as an exact-below-2^24 f32
    # value — NOT a bitcast: int32 bits < 2^23 are f32 denormals, which the
    # TPU transpose below flushes to zero. (A standalone 1-D ``offsets[g]``
    # gather lowers to the TPU scalar path: ~45 ms at 2M instances; as a
    # table column it is free.) Survivor bitmasks ride as four 16-bit-valued
    # f32 columns for the same reason.
    assert max_instances < 1 << 24, "offsets ride an f32 column exactly"
    j = jnp.arange(max_instances, dtype=jnp.int32)
    g = jnp.clip(_owner_of_slot(offsets, max_instances), 0, tiles.shape[0] - 1)
    alive = j < total_eff
    parts = [
        prep.rect.astype(jnp.float32),
        prep.depths[:, None],
        offsets.astype(jnp.float32)[:, None],
    ]
    if tile_cull:
        parts += [
            jnp.stack(
                [
                    (mlo & 0xFFFF).astype(jnp.float32),
                    ((mlo >> 16) & 0xFFFF).astype(jnp.float32),
                    (mhi & 0xFFFF).astype(jnp.float32),
                    ((mhi >> 16) & 0xFFFF).astype(jnp.float32),
                ],
                axis=-1,
            ),
            jnp.stack([c_sx, c_sy, c_wb], axis=-1).astype(jnp.float32),
            prep.means2d,
            prep.conic,
            prep.opacity[:, None],
        ]
    table = jnp.concatenate(parts, axis=-1)
    ncol = table.shape[1]
    # column-major flatten forces ONE physical transpose: XLA pads the minor
    # dim of a (R, C) row-major table to 128 lanes, so every column slice of
    # it re-scans ~10× the data (measured 22 ms for 12 columns at R=2M; this
    # costs 9 ms)
    flat = jax.lax.optimization_barrier(table[g].T.reshape(-1))
    cols = [
        jax.lax.dynamic_slice_in_dim(flat, c * max_instances, max_instances)
        for c in range(ncol)
    ]
    x0 = cols[0].astype(jnp.int32)
    y0 = cols[1].astype(jnp.int32)
    local = j - cols[5].astype(jnp.int32)
    if tile_cull:
        lo_m = cols[6].astype(jnp.int32) | (cols[7].astype(jnp.int32) << 16)
        hi_m = cols[8].astype(jnp.int32) | (cols[9].astype(jnp.int32) << 16)
        tx, ty, in_rect = _hier_decode(
            x0, y0, cols[2].astype(jnp.int32), cols[3].astype(jnp.int32),
            cols[10].astype(jnp.int32), cols[11].astype(jnp.int32),
            cols[12].astype(jnp.int32), lo_m, hi_m, local,
        )
    else:
        width = jnp.maximum(cols[2].astype(jnp.int32) - x0, 1)
        tx = x0 + local % width
        ty = y0 + local // width
    tile_id = ty * grid_x + tx - tile_lo
    in_window = alive & (tile_id >= 0) & (tile_id < num_tiles)
    keep = in_window
    if tile_cull:
        from omnigs_tpu.ops.preprocess import TILE

        # exact per-tile re-test (the block mask is conservative)
        mx, my = cols[13], cols[14]
        cA, cB, cC = cols[15], cols[16], cols[17]
        op = cols[18]
        px0 = (tx * TILE).astype(jnp.float32)
        py0 = (ty * TILE).astype(jnp.float32)
        qmin = _min_quad_over_box(
            cA, cB, cC,
            px0 - mx, px0 + (TILE - 1) - mx,
            py0 - my, py0 + (TILE - 1) - my,
        )
        # max α over the tile = op·exp(-½·qmin); drop if even that < 1/255 —
        # every pixel would fail the kernel's α ≥ ALPHA_MIN skip.
        alpha_max = op * jnp.exp(-0.5 * qmin)
        keep = keep & in_rect & (alpha_max >= 1.0 / 255.0)
    # culled/dead instances leave the window entirely (they sort into the
    # tail garbage past every tile's segment, which aligned_cap slices off
    # downstream) so per-tile segments are sized by *surviving* counts —
    # the live slab shrinks by the culled fraction and no post-sort
    # finite-count recovery is needed.
    tile_id = jnp.where(keep, tile_id, num_tiles)
    depth = jnp.where(keep, cols[4], jnp.inf)
    # materialize once: both sorts below consume these, and XLA otherwise
    # duplicates the whole expansion chain (a full re-scan of the gathered
    # table) into each consumer fusion — measured ~19 ms of recompute
    tile_id, depth, g, keep = jax.lax.optimization_barrier(
        (tile_id, depth, g, keep)
    )

    # exact per-tile counts of surviving instances (pre-sort, needed for the
    # ghost padding budget): 1-key mini-sort histogram
    counts = _sorted_histogram(tile_id, num_tiles)
    padded = ((counts + chunk - 1) // chunk) * chunk
    astarts = jnp.cumsum(padded) - padded

    # ghost padding instances (sort after reals of their tile via depth=inf)
    n_ghost = num_tiles * chunk
    ghost_counts = padded - counts
    ghost_offsets = jnp.cumsum(ghost_counts) - ghost_counts
    total_ghosts = jnp.sum(ghost_counts)
    gj = jnp.arange(n_ghost, dtype=jnp.int32)
    gtile = jnp.clip(_owner_of_slot(ghost_offsets, n_ghost), 0, num_tiles - 1)
    galive = gj < total_ghosts
    gtile_id = jnp.where(galive, gtile, num_tiles)

    all_tile = jnp.concatenate([tile_id, gtile_id])
    all_depth = jnp.concatenate(
        [depth, jnp.full((n_ghost,), jnp.inf, depth.dtype)]
    )
    all_g = jnp.concatenate([g, jnp.zeros((n_ghost,), jnp.int32)])
    sorted_e = seg_lo = seg_hi = None
    if with_emission:
        # survivor-rank payload for the gather-based gradient reduction
        # (`_emission_segments`; replaces the r2 raw-slot segdiff whose
        # scatter-SET into an R-sized table measured 275 ms)
        e, seg_lo, seg_hi = _emission_segments(
            keep, offsets, tiles_eff, max_instances
        )
        all_e = jnp.concatenate(
            [e, jnp.full((n_ghost,), E_SENTINEL, jnp.int32)]
        )
        _, _, sorted_g, sorted_e = jax.lax.sort(
            (all_tile, all_depth, all_g, all_e), num_keys=2, is_stable=True
        )
    else:
        _, _, sorted_g = jax.lax.sort(
            (all_tile, all_depth, all_g), num_keys=2, is_stable=True
        )

    return BinnedInstances(
        sorted_g=sorted_g,
        starts=astarts,
        counts=counts,
        num_instances=total_eff,
        truncated=total - total_eff,
        sorted_e=sorted_e,
        seg_lo=seg_lo,
        seg_hi=seg_hi,
    )


def align_instances(
    inst: BinnedInstances, chunk: int, max_aligned: int
) -> BinnedInstances:
    """Re-lay instances so each tile's slab starts at a chunk-aligned offset.

    The Pallas kernels DMA (NROWS, chunk) slabs from the instance array; TPU
    memref slicing requires lane offsets divisible by the tile width (128),
    so tight per-tile ranges don't work. This pads each tile's range up to a
    multiple of ``chunk``; pad slots alias a clipped source instance and are
    masked in-kernel by the true per-tile count.
    """
    counts = inst.counts
    padded = ((counts + chunk - 1) // chunk) * chunk
    astarts = jnp.cumsum(padded) - padded
    total_aligned = astarts[-1] + padded[-1]

    # aligned slot j → owning tile (scatter+cumsum, not searchsorted)
    tile = jnp.clip(
        _owner_of_slot(astarts, max_aligned), 0, counts.shape[0] - 1
    )
    j = jnp.arange(max_aligned, dtype=jnp.int32)
    # one row gather for the three per-tile fields (col gathers are slow)
    tileinfo = jnp.stack([inst.starts, counts, astarts], axis=-1)[tile]
    t_start, t_count, t_astart = (
        tileinfo[:, 0],
        tileinfo[:, 1],
        tileinfo[:, 2],
    )
    k = j - t_astart
    src = jnp.clip(
        t_start + jnp.minimum(k, jnp.maximum(t_count - 1, 0)),
        0,
        inst.sorted_g.shape[0] - 1,
    )
    sorted_g = inst.sorted_g[src]
    # clamp tiles that would run past the aligned buffer (counted, not silent)
    safe_counts = jnp.clip(counts, 0, jnp.maximum(max_aligned - astarts, 0))
    astarts = jnp.minimum(astarts, max_aligned)
    return BinnedInstances(
        sorted_g=sorted_g,
        starts=astarts,
        counts=safe_counts,
        num_instances=inst.num_instances,
        truncated=inst.truncated
        + jnp.maximum(total_aligned - max_aligned, 0),
    )


def bin_gaussians(
    prep: Preprocessed,
    grid_x: int,
    grid_y: int,
    max_instances: int,
    tile_cap: int,
    tile_lo=0,
    n_tiles: int | None = None,
) -> BinnedTiles:
    """Dense (num_tiles, tile_cap) layout on top of `bin_instances` — the
    XLA compositor's input. Overflow beyond ``tile_cap`` is counted."""
    inst = bin_instances(
        prep, grid_x, grid_y, max_instances, tile_lo, n_tiles
    )
    k = jnp.arange(tile_cap, dtype=jnp.int32)
    gather_idx = inst.starts[:, None] + k[None, :]
    tile_mask = k[None, :] < jnp.minimum(inst.counts, tile_cap)[:, None]
    gather_idx = jnp.clip(gather_idx, 0, max_instances - 1)
    tile_ids = inst.sorted_g[gather_idx]

    overflow = jnp.sum(jnp.maximum(inst.counts - tile_cap, 0))
    return BinnedTiles(
        tile_ids=tile_ids,
        tile_mask=tile_mask,
        tile_counts=inst.counts,
        num_instances=inst.num_instances,
        overflow=overflow,
        truncated=inst.truncated,
    )
