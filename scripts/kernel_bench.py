#!/usr/bin/env python
"""Per-stage microbench of the Pallas rasterization pipeline on one chip.

Times each stage of the production path standalone (preprocess, aligned
binning, instance-slab build, fwd kernel, bwd kernel, gradient reduction
variants) at the same workload as bench.py, so kernel work can be attributed
and optimizations measured in isolation.

Usage: python scripts/kernel_bench.py [--stages fwd bwd red]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, n=20, warmup=2):
    """Time a jitted fn reliably: reduce every output to one scalar inside
    the jit and fetch it — `block_until_ready` alone can return before the
    work completes on the tunneled TPU backend (measured: a 69 ms gather
    "completes" in 0.04 ms under block_until_ready)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def wrapped(*a):
        out = fn(*a)
        leaves = [
            x
            for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")
        ]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    for _ in range(warmup):
        out = wrapped(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = wrapped(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", nargs="*", default=None)
    ap.add_argument("--gaussians", type=int, default=1 << 17)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=960)
    ap.add_argument("--max-instances", type=int, default=26 << 16)
    ap.add_argument("--layout", choices=("compact", "ghost"), default="compact")
    ap.add_argument("--cap", type=int, default=8704 * 128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnigs_tpu.cameras import Camera, CameraType
    from omnigs_tpu.ops.binning import (
        bin_instances,
        bin_instances_aligned,
        bin_instances_packed,
    )
    from omnigs_tpu.ops.preprocess import TILE, preprocess, tile_grid
    from omnigs_tpu.ops import pallas_raster as pr
    from __graft_entry__ import _example_model

    W, H = args.width, args.height
    P = args.gaussians
    R = args.max_instances
    camera = Camera(CameraType.LONLAT, W, H)
    gx, gy = tile_grid(camera)
    num_tiles = gx * gy
    model = _example_model(capacity=P, n=P)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)

    want = lambda s: args.stages is None or s in args.stages

    def prep_fn(xyz, scaling, rotation, opacity, f_dc, f_rest, active):
        scales = jnp.exp(scaling)
        quats = rotation / jnp.linalg.norm(rotation, axis=-1, keepdims=True)
        ops_ = jax.nn.sigmoid(opacity[:, 0])
        shs = jnp.concatenate([f_dc, f_rest], axis=1)
        return preprocess(
            xyz, scales, quats, ops_, shs, camera, vm, campos, 3,
            tight_culling=True,
        )

    prep_j = jax.jit(prep_fn)
    margs = (
        model.xyz, model.scaling, model.rotation, model.opacity,
        model.features_dc, model.features_rest, model.active,
    )
    prep = prep_j(*margs)
    jax.block_until_ready(prep)
    print(f"workload: P={P} {W}x{H} tiles={num_tiles} R={R}")

    if want("prep"):
        print(f"preprocess            {timeit(prep_j, *margs):8.2f} ms")

    cap = args.cap

    if args.layout == "ghost":
        def bin_fn(p):
            return bin_instances_aligned(
                p, gx, gy, R, pr.CHUNK, tile_cull=True
            )
    else:
        def bin_fn(p):
            inst = bin_instances(p, gx, gy, R, tile_cull=True)
            fits = inst.starts + inst.counts <= cap
            return inst._replace(
                counts=jnp.where(fits, inst.counts, 0),
                starts=jnp.clip(inst.starts, 0, cap - 1),
                sorted_g=inst.sorted_g[:cap],
            )

    bin_j = jax.jit(bin_fn)
    inst = bin_j(prep)
    jax.block_until_ready(inst)
    n_inst = int(inst.num_instances)
    n_comp = int(jnp.sum(inst.counts))
    print(
        f"instances: emitted={n_inst} composited={n_comp} "
        f"avg/tile={n_comp / num_tiles:.0f} truncated={int(inst.truncated)}"
    )
    if want("bin"):
        print(f"binning ({args.layout}+cull){timeit(bin_j, prep):8.2f} ms")

    if want("bin_packed") and args.layout == "compact":
        # round-4 depth-presorted packed-key binning (same trim applied)
        def binp_fn(p, emission):
            inst = bin_instances_packed(
                p, gx, gy, R, tile_cull=True, with_emission=emission
            )
            fits = inst.starts + inst.counts <= cap
            return inst._replace(
                counts=jnp.where(fits, inst.counts, 0),
                starts=jnp.clip(inst.starts, 0, cap - 1),
                sorted_g=inst.sorted_g[:cap],
            )

        binp_j = jax.jit(lambda p: binp_fn(p, False))
        binpe_j = jax.jit(lambda p: binp_fn(p, True))
        jax.block_until_ready(binp_j(prep))
        print(f"binning (packed+cull) {timeit(binp_j, prep):8.2f} ms")
        inst_pk = binpe_j(prep)
        jax.block_until_ready(inst_pk)
        print(f"binning (packed+emit) {timeit(binpe_j, prep):8.2f} ms")

    build_j = jax.jit(
        lambda p, sg: pr._build_inst(p.means2d, p.conic, p.rgb, p.opacity, sg)
    )
    inst_T = build_j(prep, inst.sorted_g)
    jax.block_until_ready(inst_T)
    if want("build"):
        print(f"build slab            {timeit(build_j, prep, inst.sorted_g):8.2f} ms")
        build_live_j = jax.jit(
            lambda p, sg, s, c: pr._build_inst(
                p.means2d, p.conic, p.rgb, p.opacity, sg,
                jnp.max(s + c),
            )
        )
        jax.block_until_ready(
            build_live_j(prep, inst.sorted_g, inst.starts, inst.counts)
        )
        print(f"build slab (live)     {timeit(build_live_j, prep, inst.sorted_g, inst.starts, inst.counts):8.2f} ms")

    t_ids = np.arange(num_tiles)
    x0 = jnp.asarray((t_ids % gx) * TILE, jnp.int32)
    y0 = jnp.asarray((t_ids // gx) * TILE, jnp.int32)

    fwd_j = jax.jit(
        lambda iT, s, c: pr.composite_pallas_fwd(iT, s, c, x0, y0, num_tiles)
    )
    color, finalT, ncontrib = fwd_j(inst_T, inst.starts, inst.counts)
    jax.block_until_ready(color)
    if want("fwd"):
        print(f"fwd kernel            {timeit(fwd_j, inst_T, inst.starts, inst.counts):8.2f} ms")

    bg = jnp.zeros(3)
    color_full = color + finalT[:, None, :] * bg[None, :, None]
    dcolor = jnp.ones_like(color_full) / (W * H)
    bwd_j = jax.jit(
        lambda iT, s, c, cf, dc: pr.composite_pallas_bwd(
            iT, s, c, x0, y0, cf, dc, num_tiles
        )
    )
    dinst = bwd_j(inst_T, inst.starts, inst.counts, color_full, dcolor)
    jax.block_until_ready(dinst)
    if want("bwd"):
        print(f"bwd kernel            {timeit(bwd_j, inst_T, inst.starts, inst.counts, color_full, dcolor):8.2f} ms")

    if want("fwd_nc"):
        fwdnc_j = jax.jit(
            lambda iT, s, c: pr.composite_pallas_fwd(
                iT, s, c, x0, y0, num_tiles, want_ncontrib=False
            )
        )
        jax.block_until_ready(fwdnc_j(inst_T, inst.starts, inst.counts))
        print(f"fwd kernel (no nctr)  {timeit(fwdnc_j, inst_T, inst.starts, inst.counts):8.2f} ms")

    if want("bwd_fused") and P <= pr.FUSED_REDUCE_MAX_P:
        bwdf_j = jax.jit(
            lambda iT, ids, s, c, cf, dc: pr.composite_pallas_bwd_fused(
                iT, ids, s, c, x0, y0, cf, dc, num_tiles, P
            )
        )
        outf = bwdf_j(
            inst_T, inst.sorted_g, inst.starts, inst.counts, color_full,
            dcolor,
        )
        jax.block_until_ready(outf)
        print(f"bwd fused (kern+red)  {timeit(bwdf_j, inst_T, inst.sorted_g, inst.starts, inst.counts, color_full, dcolor):8.2f} ms")

    if want("seg"):
        # round-5 segmented-chunk pipeline: relay + linear-walk kernels
        from omnigs_tpu.ops.binning import segment_relay
        from omnigs_tpu.ops import pallas_seg as ps

        r8 = cap

        relay_j = jax.jit(
            lambda i: segment_relay(
                i.sorted_g, i.sorted_e, i.starts, i.counts, r8, P
            )
        )
        # relay consumes the UNTRIMMED compact result (r8 trims internally)
        bin_u_j = jax.jit(lambda p: bin_instances(p, gx, gy, R, tile_cull=True))
        inst_u = bin_u_j(prep)
        jax.block_until_ready(inst_u)
        seg = relay_j(inst_u)
        jax.block_until_ready(seg)
        print(f"seg relay             {timeit(relay_j, inst_u):8.2f} ms")
        print(
            f"  live8={int(seg.live8)} (+{int(seg.live8) - n_comp} pad) "
            f"chunks={int(seg.live8) // 128} trunc={int(seg.truncated)}"
        )

        build8_j = jax.jit(
            lambda p, sg, lv, rd, rt: ps._build_inst_seg(
                p.means2d, p.conic, p.rgb, p.opacity, sg, lv, None, rd, rt
            )
        )
        inst_T8 = build8_j(
            prep, seg.sorted_g8, seg.live8, seg.ride_d, seg.ride_t
        )
        jax.block_until_ready(inst_T8)
        print(f"build slab8           {timeit(build8_j, prep, seg.sorted_g8, seg.live8, seg.ride_d, seg.ride_t):8.2f} ms")

        sfwd_j = jax.jit(
            lambda iT, s, c, lv: ps.composite_seg_fwd(
                iT, s, c, lv, num_tiles, gx
            )
        )
        scolor, sfinalT = sfwd_j(inst_T8, seg.starts8, seg.counts, seg.live8)
        jax.block_until_ready(scolor)
        print(f"seg fwd kernel        {timeit(sfwd_j, inst_T8, seg.starts8, seg.counts, seg.live8):8.2f} ms")

        scolor_full = scolor + sfinalT[:, None, :] * bg[None, :, None]
        sdcolor = jnp.ones_like(scolor_full) / (W * H)
        sbwd_j = jax.jit(
            lambda iT, s, c, lv, cf, dc: ps.composite_seg_bwd(
                iT, s, c, lv, cf, dc, num_tiles, gx
            )
        )
        sdinst = sbwd_j(
            inst_T8, seg.starts8, seg.counts, seg.live8, scolor_full, sdcolor
        )
        jax.block_until_ready(sdinst)
        print(f"seg bwd kernel        {timeit(sbwd_j, inst_T8, seg.starts8, seg.counts, seg.live8, scolor_full, sdcolor):8.2f} ms")

    if want("red"):
        r = inst.sorted_g.shape[0]

        def red_scatter9(di, sg):
            rows = di[:9, :r].T
            return jnp.zeros((P, 9)).at[sg].add(rows)

        def red_scatter16(di, sg):
            rows = di[:, :r].T
            return jnp.zeros((P, 16)).at[sg].add(rows)

        print(f"red: scatter-add (R,9){timeit(jax.jit(red_scatter9), dinst, inst.sorted_g):8.2f} ms")
        print(f"red: scatter-add(R,16){timeit(jax.jit(red_scatter16), dinst, inst.sorted_g):8.2f} ms")

        CH_R = 1 << 16

        def red_scatter_live(di, sg, s, c):
            # the production live-bound chunked reduction (_ci_bwd)
            rows = di[:9, :r].T
            live = jnp.max(s + c)
            r_pad = -(-r // CH_R) * CH_R
            ids_p = jnp.concatenate(
                [sg, jnp.full((r_pad - r,), P, jnp.int32)]
            )
            rows_p = jnp.concatenate(
                [rows, jnp.zeros((r_pad - r, 9), rows.dtype)]
            )
            n_ch = jnp.minimum((live + CH_R - 1) // CH_R, r_pad // CH_R)

            def addc(carry):
                acc, i = carry
                off = i * CH_R
                ids_c = jax.lax.dynamic_slice(ids_p, (off,), (CH_R,))
                rows_c = jax.lax.dynamic_slice(rows_p, (off, 0), (CH_R, 9))
                return acc.at[ids_c].add(rows_c, mode="drop"), i + 1

            acc, _ = jax.lax.while_loop(
                lambda cr: cr[1] < n_ch, addc,
                (jnp.zeros((P, 9)), jnp.int32(0)),
            )
            return acc

        print(f"red: scatter (live)   {timeit(jax.jit(red_scatter_live), dinst, inst.sorted_g, inst.starts, inst.counts):8.2f} ms")

        # round-4 production candidate: survivor-rank inversion + gather +
        # cumsum/segdiff (pallas_raster.gather_reduce_rows). Uses the
        # with_emission binning of whichever layout is selected. (The r2
        # raw-slot scatter-SET segdiff measured 275 ms and was replaced.)
        if args.layout == "ghost":
            bin_e_j = jax.jit(
                lambda p: bin_instances_aligned(
                    p, gx, gy, R, pr.CHUNK, with_emission=True, tile_cull=True
                )
            )
        else:
            def _bin_e(p):
                inst_e = bin_instances(
                    p, gx, gy, R, tile_cull=True, with_emission=True
                )
                fits = inst_e.starts + inst_e.counts <= cap
                return inst_e._replace(
                    counts=jnp.where(fits, inst_e.counts, 0),
                    starts=jnp.clip(inst_e.starts, 0, cap - 1),
                    sorted_g=inst_e.sorted_g[:cap],
                )

            bin_e_j = jax.jit(_bin_e)
        inst_e = bin_e_j(prep)
        jax.block_until_ready(inst_e)
        print(f"binning w/ emission   {timeit(bin_e_j, prep):8.2f} ms")

        def red_gather(di, se, lo, hi):
            return pr.gather_reduce_rows(di[:9, :r].T, se, lo, hi)

        print(f"red: gather+segdiff   {timeit(jax.jit(red_gather), dinst, inst_e.sorted_e, inst_e.seg_lo, inst_e.seg_hi):8.2f} ms")

        def red_sortsum(di, sg):
            rows = di[:9, :r].T
            order_keys = [sg] + [rows[:, i] for i in range(9)]
            out = jax.lax.sort(tuple(order_keys), num_keys=1, is_stable=False)
            sid = out[0]
            srows = jnp.stack(out[1:], axis=-1)
            cs = jnp.cumsum(srows, axis=0)
            # segment ends: last occurrence of each id
            idx = jnp.searchsorted(sid, jnp.arange(P + 1, dtype=sg.dtype))
            csz = jnp.concatenate([jnp.zeros((1, 9)), cs], axis=0)
            return csz[idx[1:]] - csz[idx[:-1]]

        print(f"red: sort+segsum      {timeit(jax.jit(red_sortsum), dinst, inst.sorted_g):8.2f} ms")


if __name__ == "__main__":
    main()
