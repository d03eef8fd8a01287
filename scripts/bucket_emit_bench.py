#!/usr/bin/env python
"""Prototype bench for the Pallas bucketed counting sort (BENCH r4 #1).

The idea: skip ``lax.sort`` + the expansion row-gather + ``_build_inst`` by
scattering each surviving (gaussian, tile) instance's 16-float row straight
into its chunk-aligned slab slot (per-tile running offsets from the
histogram + cumsum that already exist). On TPU every formulation of that
scatter bottoms out in ONE primitive: a per-instance write of a (16,1)
column to a *data-dependent* slot — there is no vector path for scattered
lane addressing (Mosaic lowers it to masked stores / lane rotates), and
cross-program HBM scatter isn't expressible in Pallas at all (output blocks
are program-owned), so the best case is destinations resident in VMEM and
block-local.

This kernel measures exactly that best case: G programs × K instances,
data and destinations already in VMEM, slots a permutation WITHIN the
program's own output block (maximum locality — the real counting sort
scatters across the whole slab). Compare ns/instance against the ~3-6 ms
the packed-key ``lax.sort`` actually costs at the production emission
(~1.1M): if even the VMEM-resident lower bound loses, the structure is
measured-dead on this hardware.

Prior art (BENCH.md): fused-reduce per-instance RMW loop ~150 ns/inst,
XLA scatter-SET of rows 275 ms @2M, scatter-ADD ~14-17 ns/row (serial).
Replaces /root/reference/cuda_rasterizer/rasterizer_impl.cu:94-167 the
sort-based way instead.
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

NROWS = 16
K = 2048  # instances per program (output block = its own slab window;
# larger blocks hit the 16M scoped-vmem stack limit via the lane-padded
# (K,1) slots operand)


def _emit_kernel(slots_ref, data_ref, out_ref):
    """Per-instance dynamic-slot row writes, everything VMEM-resident.

    Sublane-major layout — (instance, field) with the 16 fields on lanes —
    because Mosaic has NO lowering for dynamic LANE indexing at all
    ("cannot statically prove index is a multiple of 128"); the only
    per-instance dynamic addressing available is on the sublane axis,
    exactly like the fused-reduce RMW loop (BENCH.md r3: ~150 ns/inst)."""

    def body(j, _):
        slot = slots_ref[j, 0]
        out_ref[slot, :] = data_ref[j, :]
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def emit(slots, data, grid):
    import os

    return pl.pallas_call(
        _emit_kernel,
        interpret=os.environ.get("JAX_PLATFORMS", "") == "cpu",
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((K, 1), lambda i: (i, 0)),
            pl.BlockSpec((K, NROWS), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((K, NROWS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((grid * K, NROWS), jnp.float32),
    )(slots, data)


def timeit(fn, *args, n=10, warmup=2):
    wrapped = jax.jit(lambda *a: jnp.sum(fn(*a)))
    for _ in range(warmup):
        out = wrapped(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = wrapped(*args)
    float(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    R = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20  # ~1M emission
    grid = R // K
    rng = np.random.default_rng(0)
    # block-local permutation destinations (best case; real counting-sort
    # slots span the whole slab)
    slots = np.stack(
        [rng.permutation(K).astype(np.int32) for _ in range(grid)]
    ).reshape(grid * K, 1)
    data = rng.standard_normal((grid * K, NROWS), dtype=np.float32)
    slots_j = jnp.asarray(slots)
    data_j = jnp.asarray(data)

    ms = timeit(functools.partial(emit, grid=grid), slots_j, data_j)
    print(
        f"VMEM-local per-instance emit: {ms:8.2f} ms for {grid * K} rows "
        f"({ms * 1e6 / (grid * K):6.1f} ns/row)"
    )

    # the incumbent it would have to beat: packed-key 1-key unstable sort
    keys = jnp.asarray(rng.integers(0, 1 << 31, R, dtype=np.int32))

    def do_sort(k):
        return jax.lax.sort((k,), num_keys=1, is_stable=False)[0]

    ms_s = timeit(do_sort, keys)
    print(
        f"lax.sort 1-key unstable:      {ms_s:8.2f} ms for {R} rows "
        f"({ms_s * 1e6 / R:6.1f} ns/row)"
    )


if __name__ == "__main__":
    main()
