#!/usr/bin/env python
"""Microbench: instance→Gaussian gradient reduction strategies.

The (R, 9) → (P, 9) reduction after the Pallas backward is the single
biggest non-kernel line of the training step (~21.7 ms at the bench
workload, BENCH.md): XLA's scatter-add lowers to a serial ~17 ns/row loop.
This bench compares, at bench-shaped sizes:

  a) XLA live-bound chunked scatter-add (the production path)
  b) Pallas streaming kernel: per-instance dynamic-lane accumulate into a
     VMEM-resident (16, P) table — issue-bound, but controls the loop
  c) sort-by-gaussian (1 key + slab-position payload) + big-table row
     gather + cumsum/segment-diff (for the record)

Usage: python scripts/reduce_bench.py [R] [P]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NROWS = 16
CHUNK = 128


def _reduce_kernel(ids_hbm, rows_hbm, acc_ref, buf, idbuf, sems, idsems,
                   *, n_chunks):
    """acc (16, P) += per-instance columns of rows (16, R) at lanes ids."""
    acc_ref[:] = jnp.zeros_like(acc_ref)

    def get_dma(slot, c):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(c * CHUNK, CHUNK)], buf.at[slot],
            sems.at[slot],
        )

    def get_iddma(slot, c):
        return pltpu.make_async_copy(
            ids_hbm.at[:, pl.ds(c * CHUNK, CHUNK)], idbuf.at[slot],
            idsems.at[slot],
        )

    get_dma(0, 0).start()
    get_iddma(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()
            get_iddma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()
        get_iddma(slot, c).wait()

        def inner(j, _):
            gid = idbuf[slot, 0, j]
            acc_ref[:, pl.ds(gid, 1)] += buf[slot, :, pl.ds(j, 1)]
            return 0

        jax.lax.fori_loop(0, CHUNK, inner, 0)
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def pallas_reduce(ids, rows, P):
    """ids (R,) int32, rows (16, R) f32 → (16, P) accumulated."""
    R = ids.shape[0]
    assert R % CHUNK == 0
    n_chunks = R // CHUNK
    return pl.pallas_call(
        functools.partial(_reduce_kernel, n_chunks=n_chunks),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NROWS, P), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.SMEM((2, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(ids[None, :], rows)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    # default mirrors the round-3 re-measured production reduction shape:
    # slab cap 8704·128 ≈ 1.11M rows, ~1.02M live (ADVICE r3 #4; the old
    # 1.83M/0.89 default was the round-2 workload)
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 8704 * 128  # 1.11M
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17
    live_frac = 0.92  # bench r3: 1.02M live of the 1.11M slab cap
    live = int(R * live_frac) // CHUNK * CHUNK

    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (R,), 0, P, jnp.int32)
    rows = jax.random.normal(jax.random.PRNGKey(1), (NROWS, R), jnp.float32)
    rows9 = rows[:9].T  # (R, 9) as the XLA path consumes it

    # a) XLA live-bound chunked scatter-add (mirror of pallas_raster._ci_bwd)
    CH_R = 1 << 16

    @jax.jit
    def xla_scatter(ids, rows9):
        n_chunks = live // CH_R

        def _add(carry):
            acc, i = carry
            off = i * CH_R
            ids_c = jax.lax.dynamic_slice(ids, (off,), (CH_R,))
            rows_c = jax.lax.dynamic_slice(rows9, (off, 0), (CH_R, 9))
            return acc.at[ids_c].add(rows_c, mode="drop"), i + 1

        acc, _ = jax.lax.while_loop(
            lambda c: c[1] < n_chunks, _add, (jnp.zeros((P, 9)), jnp.int32(0))
        )
        return acc

    t_a, acc_a = timeit(xla_scatter, ids, rows9)
    print(f"a) XLA scatter-add   live={live}: {t_a*1e3:8.2f} ms "
          f"({t_a/live*1e9:.1f} ns/row)", flush=True)

    # b) Pallas streaming reduce
    @jax.jit
    def pl_reduce(ids, rows):
        return pallas_reduce(ids[:live], rows[:, :live], P)

    try:
        t_b, acc_b = timeit(pl_reduce, ids, rows)
        err = float(jnp.abs(acc_b[:9].T - acc_a).max())
        print(f"b) Pallas reduce     live={live}: {t_b*1e3:8.2f} ms "
              f"({t_b/live*1e9:.1f} ns/row)  maxerr={err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"b) Pallas reduce FAILED: {type(e).__name__}: {e}",
              flush=True)

    # c) sort by gaussian + gather + segment-diff
    @jax.jit
    def sort_reduce(ids, rows9):
        sid, pos = jax.lax.sort(
            (ids[:live], jnp.arange(live, dtype=jnp.int32)), num_keys=1,
            is_stable=False,
        )
        g = rows9[pos]  # big-table row gather
        cs = jnp.concatenate([jnp.zeros((1, 9)), jnp.cumsum(g, axis=0)])
        lo = jnp.searchsorted(sid, jnp.arange(P, dtype=jnp.int32),
                              side="left")
        hi = jnp.searchsorted(sid, jnp.arange(P, dtype=jnp.int32),
                              side="right")
        return cs[hi] - cs[lo]

    t_c, acc_c = timeit(sort_reduce, ids, rows9)
    err_c = float(jnp.abs(acc_c - acc_a).max())
    print(f"c) sort+gather+diff  live={live}: {t_c*1e3:8.2f} ms "
          f"({t_c/live*1e9:.1f} ns/row)  maxerr={err_c:.2e}", flush=True)


if __name__ == "__main__":
    main()
