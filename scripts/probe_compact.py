#!/usr/bin/env python
"""Probe: how small is the contributing slab, and how does scatter-add cost
scale with row count? Decides the bwd-compaction design."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
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
    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops.preprocess import preprocess, tile_grid
    from omnigs_tpu.ops.binning import bin_instances_aligned
    from omnigs_tpu.ops.pallas_raster import (
        CHUNK, _build_inst, composite_pallas_fwd,
    )
    from __graft_entry__ import _example_model

    W, H = 1920, 960
    P = 1 << 17
    R = 1 << 21
    camera = Camera(CameraType.LONLAT, W, H)
    gx, gy = tile_grid(camera)
    model = _example_model(capacity=P, n=P)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)

    @jax.jit
    def fwd_pipe(params):
        import jax as _j
        m = model.with_params(params)
        prep = preprocess(
            m.xyz, m.get_scaling(), m.get_rotation(), m.get_opacity(),
            m.get_features(), camera, vm, campos, 3, 1.0, tight_culling=True,
        )
        inst = bin_instances_aligned(prep, gx, gy, R, CHUNK, tile_cull=True)
        cap = 7 << 18
        padded = ((inst.counts + CHUNK - 1) // CHUNK) * CHUNK
        fits = inst.starts + padded <= cap
        counts = jnp.where(fits, inst.counts, 0)
        starts = jnp.clip(inst.starts, 0, cap - CHUNK)
        sorted_g = inst.sorted_g[:cap]
        t_ids = np.arange(gx * gy)
        x0 = jnp.asarray((t_ids % gx) * 16, jnp.int32)
        y0 = jnp.asarray((t_ids // gx) * 16, jnp.int32)
        inst_T = _build_inst(
            prep.means2d, prep.conic, prep.rgb, prep.opacity, sorted_g
        )
        color, finalT, ncontrib = composite_pallas_fwd(
            inst_T, starts, counts, x0, y0, gx * gy
        )
        return counts, ncontrib

    params = model.params()
    counts, ncontrib = fwd_pipe(params)
    counts = np.asarray(counts)
    m = np.asarray(jnp.max(ncontrib, axis=1))
    mp = ((m + CHUNK - 1) // CHUNK) * CHUNK
    cp = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    print(f"tiles={len(counts)}  sum counts={counts.sum()}  sum padded={cp.sum()}")
    print(f"max-rank m: sum={m.sum()}  sum padded mp={mp.sum()}")
    print(f"m/count ratio: {m.sum()/max(counts.sum(),1):.3f}")
    print(f"compacted slab vs aligned slab: {mp.sum()}/{cp.sum()} = {mp.sum()/cp.sum():.3f}")

    # scatter-add cost vs static row count
    key = jax.random.PRNGKey(0)
    for rr in (1 << 19, 1 << 20, 3 << 19, 1 << 21, 3 << 20):
        idx = jax.random.randint(key, (rr,), 0, P)
        vals = jax.random.normal(key, (rr, 9))
        t = timeit(
            lambda i, v: jnp.zeros((P, 9)).at[i].add(v), idx, vals, n=5
        )
        print(f"scatter-add rows={rr:>8}  {t:7.2f} ms")


if __name__ == "__main__":
    main()
