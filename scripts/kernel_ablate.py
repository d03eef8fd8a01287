#!/usr/bin/env python
"""Ablation microbench of the Pallas fwd compositing kernel: times variants
with parts removed to attribute per-chunk cost (DMA floor, α math,
transcendentals, cumsum matmul, color matmul, loop overhead).

NOTE: ablates the round-1/2 ELEMENTWISE α formulation (its per-chunk cost
attribution shaped the round-3 MXU-factored redesign; see BENCH.md). The
old elementwise helpers are inlined here so the script stays runnable."""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omnigs_tpu.ops.pallas_raster import (
    CHUNK, NROWS, PX, TPB, _lane_cumsum, T_STOP,
)
from omnigs_tpu.ops.preprocess import TILE

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
_X, _Y, _A, _B, _C, _OP, _R, _G, _B3 = range(9)


def _pixel_coords(x0, y0):
    p = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    px = (x0 + p % TILE).astype(jnp.float32)
    py = (y0 + p // TILE).astype(jnp.float32)
    return px, py


def _chunk_alpha(data, px, py, count, kbase):
    x = data[_X : _X + 1, :]
    y = data[_Y : _Y + 1, :]
    A = data[_A : _A + 1, :]
    B = data[_B : _B + 1, :]
    C = data[_C : _C + 1, :]
    op = data[_OP : _OP + 1, :]
    dx = x - px
    dy = y - py
    power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op * G)
    k = kbase + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    live = (k >= 0) & (k < count) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(live, alpha, 0.0)
    return a, live, G, dx, dy, A, B, C, op, k


def make_kernel(mode):
    def kern(starts_ref, counts_ref, x0_ref, y0_ref, inst_ref,
             out_ref, buf, sems):
        pid = pl.program_id(0)

        def tile_body(i, _):
            t = pid * TPB + i
            start = starts_ref[t]
            count = counts_ref[t]
            px, py = _pixel_coords(x0_ref[t], y0_ref[t])
            n_chunks = pl.cdiv(count, CHUNK)

            def get_dma(slot, c):
                off = pl.multiple_of(start + c * CHUNK, CHUNK)
                return pltpu.make_async_copy(
                    inst_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot],
                    sems.at[slot])

            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, 0).start()

            def cond(carry):
                c, N, _ = carry
                return (c < n_chunks) & (jnp.max(N) >= T_STOP)

            def body(carry):
                c, N, color = carry
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < n_chunks)
                def _():
                    get_dma(1 - slot, c + 1).start()

                get_dma(slot, c).wait()
                data = buf[slot]
                if mode == "dma":
                    color = color + jnp.sum(data[0:3, :], axis=1,
                                            keepdims=True) * jnp.ones((1, PX))
                    return c + 1, N, color
                a, live, G, dx, dy, A, B, C, op, k = _chunk_alpha(
                    data, px, py, count, c * CHUNK)
                if mode == "alpha":
                    color = color + jnp.sum(a, axis=1, keepdims=True).reshape(1, PX) * jnp.ones((3, 1))
                    N = N * 0.9999
                    return c + 1, N, color
                if mode == "notrans":
                    # cumprod-free: pretend l = -a (skip log1p/exp pair)
                    cs = _lane_cumsum(-a)
                    N_incl = N * (1.0 + cs)
                    w = a * N_incl
                    rgbT = data[6:9, :]
                    color = color + jax.lax.dot_general(
                        rgbT, w, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    N = N * (1.0 - jnp.sum(a, axis=1, keepdims=True) * 1e-6)
                    return c + 1, N, color
                if mode == "nocumsum":
                    l = jnp.log1p(-a)
                    N_incl = N * jnp.exp(l)
                    w = a * N_incl
                    rgbT = data[6:9, :]
                    color = color + jax.lax.dot_general(
                        rgbT, w, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    N = N * jnp.exp(jnp.sum(l, axis=1, keepdims=True))
                    return c + 1, N, color
                if mode == "lowprec":
                    l = jnp.log1p(-a)
                    cs = jnp.dot(l.astype(jnp.bfloat16),
                                 _tri16(),
                                 preferred_element_type=jnp.float32)
                    N_incl = N * jnp.exp(cs)
                    w = (a * N_incl).astype(jnp.bfloat16)
                    rgbT = data[6:9, :].astype(jnp.bfloat16)
                    color = color + jax.lax.dot_general(
                        rgbT, w, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    N = N * jnp.exp(jnp.sum(l, axis=1, keepdims=True))
                    return c + 1, N, color
                # full
                l = jnp.log1p(-a)
                cs = _lane_cumsum(l)
                N_incl = N * jnp.exp(cs)
                N_excl = N_incl / (1.0 - a)
                contrib = N_incl >= T_STOP
                w = a * N_excl * contrib
                rgbT = data[6:9, :]
                color = color + jax.lax.dot_general(
                    rgbT, w, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                N = N * jnp.exp(jnp.sum(l, axis=1, keepdims=True))
                return c + 1, N, color

            init = (jnp.int32(0), jnp.ones((PX, 1), jnp.float32),
                    jnp.zeros((3, PX), jnp.float32))
            c_final, N, color = jax.lax.while_loop(cond, body, init)

            @pl.when(c_final < n_chunks)
            def _():
                get_dma(jax.lax.rem(c_final, 2), c_final).wait()

            out_ref[0, i] = color.reshape(3 * PX)
            return 0

        jax.lax.fori_loop(0, TPB, tile_body, 0)

    return kern


def _tri16():
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r <= c).astype(jnp.bfloat16)


def run(mode, inst_T, starts, counts, x0, y0, num_tiles):
    n_prog = -(-num_tiles // TPB)
    t_pad = n_prog * TPB
    starts, counts, x0, y0 = (
        jnp.pad(a, (0, t_pad - num_tiles)) for a in (starts, counts, x0, y0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4, grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((1, TPB, 3 * PX), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))])
    return pl.pallas_call(
        make_kernel(mode), grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_prog, TPB, 3 * PX), jnp.float32)],
    )(starts, counts, x0, y0, inst_T)[0]


def timeit(fn, *args, n=10, warmup=2):
    @jax.jit
    def wrapped(*a):
        out = fn(*a)
        return jnp.sum(out[0].astype(jnp.float32))

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
    from omnigs_tpu.ops.pallas_raster import _build_inst
    from __graft_entry__ import _example_model

    W, H = 1920, 960
    P = 1 << 17
    R = 1 << 21
    cap = 7 << 18
    camera = Camera(CameraType.LONLAT, W, H)
    gx, gy = tile_grid(camera)
    model = _example_model(capacity=P, n=P)
    vm = jnp.eye(4)
    campos = jnp.zeros(3)

    @jax.jit
    def build(params):
        m = model.with_params(params)
        prep = preprocess(
            m.xyz, m.get_scaling(), m.get_rotation(), m.get_opacity(),
            m.get_features(), camera, vm, campos, 3, 1.0, tight_culling=True)
        inst = bin_instances_aligned(prep, gx, gy, R, CHUNK, tile_cull=True)
        padded = ((inst.counts + CHUNK - 1) // CHUNK) * CHUNK
        fits = inst.starts + padded <= cap
        counts = jnp.where(fits, inst.counts, 0)
        starts = jnp.clip(inst.starts, 0, cap - CHUNK)
        sorted_g = inst.sorted_g[:cap]
        inst_T = _build_inst(prep.means2d, prep.conic, prep.rgb,
                             prep.opacity, sorted_g)
        return inst_T, starts, counts

    inst_T, starts, counts = jax.block_until_ready(build(model.params()))
    t_ids = np.arange(gx * gy)
    x0 = jnp.asarray((t_ids % gx) * 16, jnp.int32)
    y0 = jnp.asarray((t_ids // gx) * 16, jnp.int32)

    for mode in ("dma", "alpha", "notrans", "nocumsum", "lowprec", "full"):
        fn = lambda a, b, c, d, e, _m=mode: run(_m, a, b, c, d, e, gx * gy)
        t = timeit(fn, inst_T, starts, counts, x0, y0)
        print(f"{mode:>10}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
