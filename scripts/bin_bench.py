#!/usr/bin/env python
"""Sub-stage microbench of bin_instances_aligned on one chip.

Times each internal phase of the aligned binning pass standalone so the
81 ms can be attributed: slot ownership, row gather, expansion math,
tile-cull math, ghost construction, the sort itself, finite-count recovery.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=20, warmup=2):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*a):
        out = fn(*a)
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    for _ in range(warmup):
        out = wrapped(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = wrapped(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops.binning import (
        _min_quad_over_box,
        _owner_of_slot,
        tile_cover_counts,
    )
    from omnigs_tpu.ops.preprocess import TILE, preprocess, tile_grid
    from omnigs_tpu.ops import pallas_raster as pr
    from __graft_entry__ import _example_model

    W, H, P, R = 1920, 960, 1 << 17, 1 << 21
    camera = Camera(CameraType.LONLAT, W, H)
    gx, gy = tile_grid(camera)
    num_tiles = gx * gy
    chunk = pr.CHUNK
    model = _example_model(capacity=P, n=P)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)

    prep = jax.jit(
        lambda m: preprocess(
            jnp.exp(m.scaling),
            jnp.exp(m.scaling),
            m.rotation / jnp.linalg.norm(m.rotation, axis=-1, keepdims=True),
            jax.nn.sigmoid(m.opacity[:, 0]),
            jnp.concatenate([m.features_dc, m.features_rest], axis=1),
            camera, vm, campos, 3, tight_culling=True,
        )
    )
    # real preprocess (use xyz not exp(scaling) — fix args)
    prep = jax.jit(
        lambda m: preprocess(
            m.xyz,
            jnp.exp(m.scaling),
            m.rotation / jnp.linalg.norm(m.rotation, axis=-1, keepdims=True),
            jax.nn.sigmoid(m.opacity[:, 0]),
            jnp.concatenate([m.features_dc, m.features_rest], axis=1),
            camera, vm, campos, 3, tight_culling=True,
        )
    )(model)
    jax.block_until_ready(prep)

    tiles = prep.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(tiles) - tiles

    # 1. slot ownership over R
    print(f"owner_of_slot R=2M    {timeit(lambda o: _owner_of_slot(o, R), offsets):8.2f} ms")

    g = jnp.clip(_owner_of_slot(offsets, R), 0, P - 1)

    # 2. row gather (R, 11) from (P, 11)
    table = jnp.concatenate(
        [prep.rect.astype(jnp.float32), prep.depths[:, None], prep.means2d,
         prep.conic, prep.opacity[:, None]], axis=-1)
    print(f"row gather (R,11)     {timeit(lambda t, gg: t[gg], table, g):8.2f} ms")

    rows = table[g]
    j = jnp.arange(R, dtype=jnp.int32)

    # 3. expansion math (tile ids)
    def expand(rows, g, offsets):
        x0 = rows[:, 0].astype(jnp.int32)
        width = jnp.maximum(rows[:, 2].astype(jnp.int32) - x0, 1)
        local = j - offsets[g]
        tx = x0 + local % width
        ty = rows[:, 1].astype(jnp.int32) + local // width
        return ty * gx + tx

    print(f"expansion math        {timeit(expand, rows, g, offsets):8.2f} ms")
    tile_id_raw = expand(rows, g, offsets)
    tile_id = jnp.clip(tile_id_raw, 0, num_tiles)

    # 4. tile-cull math
    def cull(rows, tile_id):
        tx = tile_id % gx
        ty = tile_id // gx
        mx, my = rows[:, 5], rows[:, 6]
        cA, cB, cC = rows[:, 7], rows[:, 8], rows[:, 9]
        op = rows[:, 10]
        px0 = (tx * TILE).astype(jnp.float32)
        py0 = (ty * TILE).astype(jnp.float32)
        qmin = _min_quad_over_box(
            cA, cB, cC, px0 - mx, px0 + (TILE - 1) - mx,
            py0 - my, py0 + (TILE - 1) - my)
        return op * jnp.exp(-0.5 * qmin) >= 1.0 / 255.0

    print(f"tile-cull math        {timeit(cull, rows, tile_id):8.2f} ms")

    # 5. tile_cover_counts
    print(f"tile_cover_counts     {timeit(lambda r: tile_cover_counts(r, tiles > 0, gx, gy), prep.rect):8.2f} ms")

    # 6. ghost construction
    counts = tile_cover_counts(prep.rect, tiles > 0, gx, gy)
    padded = ((counts + chunk - 1) // chunk) * chunk
    n_ghost = num_tiles * chunk

    def ghosts(padded, counts):
        gc = padded - counts
        go = jnp.cumsum(gc) - gc
        gj = jnp.arange(n_ghost, dtype=jnp.int32)
        return jnp.clip(_owner_of_slot(go, n_ghost), 0, num_tiles - 1)

    print(f"ghost construction    {timeit(ghosts, padded, counts):8.2f} ms")

    # 7. the sort (R + n_ghost entries, 2 keys + 1 payload)
    gtile = ghosts(padded, counts)
    depth = rows[:, 4]
    all_tile = jnp.concatenate([tile_id, jnp.where(jnp.arange(n_ghost) < jnp.sum(padded - counts), gtile, num_tiles)])
    all_depth = jnp.concatenate([depth, jnp.full((n_ghost,), jnp.inf)])
    all_g = jnp.concatenate([g, jnp.zeros((n_ghost,), jnp.int32)])
    print(f"sort {all_tile.shape[0]/1e6:.1f}M 2k+1p   {timeit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=True), all_tile, all_depth, all_g):8.2f} ms")

    # 7b. sort with single fused key (tile,depth packed into one f32-ordered int64? try int32 pair packed to int64)
    def packed_sort(t, d, g):
        db = jax.lax.bitcast_convert_type(d, jnp.int32)
        # map float bits to sortable int (depth >= 0 here)
        key = (t.astype(jnp.int64) << 32) | db.astype(jnp.uint32).astype(jnp.int64)
        return jax.lax.sort((key, g), num_keys=1, is_stable=True)

    print(f"sort packed int64 1k+1p{timeit(packed_sort, all_tile, all_depth, all_g):8.2f} ms")

    # 8. sort at the exact-emission scale (1.4M)
    m = 1 << 20
    print(f"sort 1.0M 2k+1p       {timeit(lambda a, b, c: jax.lax.sort((a[:m], b[:m], c[:m]), num_keys=2, is_stable=True), all_tile, all_depth, all_g):8.2f} ms")


if __name__ == "__main__":
    main()
