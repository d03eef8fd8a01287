"""Pallas TPU kernels for tile compositing — the production fast path.

Replaces the XLA `_composite_tiles` scan (ops/rasterize.py) with hand-written
Mosaic kernels mirroring the reference CUDA design
(`/root/reference/cuda_rasterizer/forward.cu:346-467`, `backward.cu:672-843`)
re-thought for the TPU:

* **Instance-major layout**: binning (ops/binning.py `bin_instances`) yields
  depth-sorted instances contiguous per tile, so each tile's instance slab
  streams HBM→VMEM with double-buffered DMA — the Pallas analog of the CUDA
  shared-memory staging loop, but with 128-instance chunks instead of 256.
* **Compositing as matmuls**: per chunk the kernel evaluates α for all
  256 pixels × 128 instances on the VPU, then uses the MXU for the
  *sequential* part: in-chunk transmittance is exp(cumsum(log1p(-α))) where
  the cumulative sum is a (256,128)×(128,128) multiply with a triangular
  ones matrix, and color accumulation is w·rgbᵀ. No per-pixel loops.
* **Early termination** is whole-tile: the chunk loop is a while_loop that
  stops when every pixel's naive transmittance N < 1e-4 (exactly the
  reference's per-pixel `done` flag, lifted to the tile level — identical
  output, bounded extra work).
* **Backward without atomics**: each tile owns a disjoint instance range, so
  the backward kernel DMAs per-instance gradients into that range of an
  instance-major gradient array; a deterministic XLA scatter-add then
  reduces instances → Gaussians (vs `atomicAdd`, `backward.cu:805-840`).

Numerics match ops/rasterize.py bit-for-bit in structure (same masks, same
quirks: 0.99-clamp ignored in backward).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omnigs_tpu.ops.preprocess import TILE

PX = TILE * TILE  # 256 pixels per tile
CHUNK = 128  # instances per VMEM chunk (lane width)
NROWS = 16  # padded rows of the instance-major slab
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_STOP = 1.0e-4

# inst_T row indices
_X, _Y, _A, _B, _C, _OP, _R, _G, _B3 = range(9)


def _tri(strict: bool) -> jnp.ndarray:
    """(CHUNK, CHUNK) M with M[i, j] = 1 if i <= j (inclusive) or i < j
    (strict): x @ M = inclusive / exclusive cumsum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return ((r < c) if strict else (r <= c)).astype(jnp.bfloat16)


def _lane_cumsum(x: jnp.ndarray, exclusive: bool = False) -> jnp.ndarray:
    """Lane cumsum as a triangular-matrix multiply. Measured faster than a
    Hillis–Steele shift-add ladder: the MXU runs concurrently with the VPU α
    math, so the matmul is effectively free while the rolls serialize onto
    the already-saturated VPU.

    Precision: the triangular matrix is 0/1 — *exact* in bf16 — so splitting
    the f32 operand into three bf16 components and summing three single-pass
    bf16 matmuls in an f32 accumulator reproduces full-f32 products at half
    the MXU passes of Precision.HIGHEST (bf16x6); measured ~4 ms/step cheaper
    at the bench workload."""
    tri = _tri(exclusive)
    x0 = x.astype(jnp.bfloat16)
    r1 = x - x0.astype(jnp.float32)
    x1 = r1.astype(jnp.bfloat16)
    x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(x0, tri, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x1, tri, preferred_element_type=jnp.float32)
    return acc + jnp.dot(x2, tri, preferred_element_type=jnp.float32)


_HALF = (TILE - 1) / 2.0  # tile-local pixel coordinate offset (7.5)


def _u_basis():
    """(PX, 6) pixel polynomial basis [1, u, v, u², u·v, v²] in TILE-LOCAL
    coordinates u = px_in_tile − 7.5, v = py_in_tile − 7.5.

    The whole per-pair Gaussian exponent is rank-6 in this basis (see
    `_chunk_alpha`), so the (PX, CHUNK) quadratic evaluation becomes ONE MXU
    matmul instead of ~10 VPU passes. Every basis entry is a half-integer
    ≤ 7.5 or a product of two (≤ 56.25) — EXACT in bfloat16 (≤ 8 mantissa
    bits) — so a 3-term bf16 split of the per-instance coefficients
    reproduces full-f32 products in 3 single-pass bf16 matmuls.
    """
    p = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
    u = (p % TILE).astype(jnp.float32) - _HALF
    v = (p // TILE).astype(jnp.float32) - _HALF
    one = jnp.ones((PX, 1), jnp.float32)
    return jnp.concatenate([one, u, v, u * u, u * v, v * v], axis=1)


def _ut_basis():
    """(6, PX) transposed basis for the backward's V-moment matmul."""
    q = jax.lax.broadcasted_iota(jnp.int32, (1, PX), 1)
    u = (q % TILE).astype(jnp.float32) - _HALF
    v = (q // TILE).astype(jnp.float32) - _HALF
    one = jnp.ones((1, PX), jnp.float32)
    return jnp.concatenate([one, u, v, u * u, u * v, v * v], axis=0)


def _split3(x):
    """f32 → three bf16 components summing (exactly at f32 re-rounding) to x."""
    x0 = x.astype(jnp.bfloat16)
    r = x - x0.astype(jnp.float32)
    x1 = r.astype(jnp.bfloat16)
    x2 = (r - x1.astype(jnp.float32)).astype(jnp.bfloat16)
    return x0, x1, x2


def _dot_exact3(a_bf16, w):
    """a @ w at ~f32 precision in 3 bf16 MXU passes, for EXACT-in-bf16 a."""
    w0, w1, w2 = _split3(w)
    acc = jnp.dot(a_bf16, w0, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(a_bf16, w1, preferred_element_type=jnp.float32)
    return acc + jnp.dot(a_bf16, w2, preferred_element_type=jnp.float32)


# α-evaluation formulation: "mm" = rank-6 MXU matmul over the pixel basis,
# "elem" = the elementwise VPU chain. Both bit-comparable (gate tolerance);
# the default is the formulation that measured faster on chip
# (scripts/kernel_bench.py A/B, BENCH.md round 3).
ALPHA_MODE = _os.environ.get("OMNIGS_ALPHA", "elem")


def _chunk_alpha(data, Ub, cx, cy, count, kbase):
    """Shared fwd/bwd α math for one (NROWS, CHUNK) chunk.

    The exponent −½(A·dx² + C·dy²) − B·dx·dy with dx = x − px factors over
    the tile-local pixel basis: power = U @ W with U the static (PX, 6)
    pixel polynomials and W six per-instance coefficient rows — built from
    the instance's tile-local center (xg, yg) = (x − cx, y − cy) by ~10
    narrow (1, CHUNK) ops ("mm" mode). Measured on chip the elementwise
    VPU chain ("elem") still wins at this chunk shape, so it stays the
    default; both modes share every downstream contract.

    Returns ``opG`` (the pre-clamp product op·G): the backward's gradient
    moments all factor through V = dL_dα·op·G (see `_bwd_tile`).
    """
    A = data[_A : _A + 1, :]
    B = data[_B : _B + 1, :]
    C = data[_C : _C + 1, :]
    op = data[_OP : _OP + 1, :]
    xg = data[_X : _X + 1, :] - cx  # (1, CHUNK) tile-local instance center
    yg = data[_Y : _Y + 1, :] - cy
    if ALPHA_MODE == "mm":
        w1 = A * xg + B * yg
        w2 = B * xg + C * yg
        w0 = -0.5 * (xg * w1 + yg * w2)
        W = jnp.concatenate(
            [w0, w1, w2, -0.5 * A, -B, -0.5 * C], axis=0
        )  # (6, CHUNK)
        power = _dot_exact3(Ub, W)  # (PX, CHUNK)
    else:
        p = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
        # absolute pixel coords: cx − _HALF = x0 and x0 + (p % TILE) are
        # exact integer algebra in f32, so dx = x − px is SINGLE-rounded —
        # bit-parity with the pre-basis formulation. ((x − cx) − u would
        # round twice; ADVICE r3 #1.)
        px = (p % TILE).astype(jnp.float32) + (cx - _HALF)
        py = (p // TILE).astype(jnp.float32) + (cy - _HALF)
        dx = data[_X : _X + 1, :] - px
        dy = data[_Y : _Y + 1, :] - py
        power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    opG = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, opG)
    k = kbase + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    # k may start negative (compact layout: the first DMA'd chunk of a tile
    # contains the previous tile's tail in its head lanes — masked here)
    live = (k >= 0) & (k < count) & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(live, alpha, 0.0)
    return a, live, opG, xg, yg, A, B, C, op, k


# tiles composited per kernel program (amortizes per-program costs);
# env-overridable for on-chip A/B sweeps (scripts/kernel_bench.py)
TPB = int(_os.environ.get("OMNIGS_TPB", "4"))


def _fwd_kernel(
    # scalar prefetch
    starts_ref,
    counts_ref,
    x0_ref,
    y0_ref,
    # inputs
    inst_ref,  # (NROWS, R_pad) in HBM
    # outputs (per-program blocks of TPB tiles; channel-planes packed into
    # lanes — a (TPB, PX, 3) block would lane-pad 3 → 128, moving 42× the
    # bytes per DMA)
    color_ref,  # (1, TPB, 3·PX)
    finalT_ref,  # (1, TPB, PX)
    ncontrib_ref,  # (1, TPB, PX)
    # scratch
    buf,  # (2, NROWS, CHUNK) VMEM
    sems,  # DMA(2)
    *,
    want_ncontrib: bool,
):
    pid = pl.program_id(0)
    Ub = _u_basis().astype(jnp.bfloat16)  # exact (see _u_basis)

    def tile_body(i, _):
        t = pid * TPB + i
        start = starts_ref[t]
        count = counts_ref[t]
        cx = x0_ref[t].astype(jnp.float32) + _HALF  # tile center
        cy = y0_ref[t].astype(jnp.float32) + _HALF
        # compact layout: segments start unaligned; DMA the containing
        # aligned chunk and mask the head lanes (head == 0 for the aligned
        # layout, where this reduces to the old behavior)
        base = (start // CHUNK) * CHUNK
        head = start - base
        n_chunks = pl.cdiv(head + count, CHUNK)

        def get_dma(slot, c):
            off = pl.multiple_of(base + c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, CHUNK)],
                buf.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def cond(carry):
            c, N, _, _, _ = carry
            return (c < n_chunks) & (jnp.max(N) >= T_STOP)

        def body(carry):
            c, N, Tstop, color, ncontrib = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            data = buf[slot]
            a, live, _, _, _, _, _, _, _, k = _chunk_alpha(
                data, Ub, cx, cy, count, c * CHUNK - head
            )
            l = jnp.log1p(-a)
            one_m = 1.0 - a
            # exclusive cumsum ⇒ N_excl needs no per-pair division
            N_excl = N * jnp.exp(_lane_cumsum(l, exclusive=True))
            N_incl = N_excl * one_m
            contrib = N_incl >= T_STOP
            w = a * N_excl * contrib
            rgbT = data[_R : _B3 + 1, :]  # (3, CHUNK)
            # accumulate channels-major (3, PX): the lane-packed output row
            # is then a cheap (3, PX) → (768,) reshape instead of a (PX, 3)
            # transpose relayout per tile
            color = color + jax.lax.dot_general(
                rgbT,
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            Tstop = Tstop * jnp.exp(
                jnp.sum(jnp.where(contrib, l, 0.0), axis=1, keepdims=True)
            )
            # ungated total = last lane of the (already-paid) tri cumsum
            # (deletes the second 7-pass lane reduction the old kernel paid)
            N = N_excl[:, CHUNK - 1 :] * one_m[:, CHUNK - 1 :]
            if want_ncontrib:
                rank = jnp.where(live & contrib, k + 1, 0)
                ncontrib = jnp.maximum(
                    ncontrib, jnp.max(rank, axis=1, keepdims=True)
                )
            return c + 1, N, Tstop, color, ncontrib

        init = (
            jnp.int32(0),
            jnp.ones((PX, 1), jnp.float32),
            jnp.ones((PX, 1), jnp.float32),
            jnp.zeros((3, PX), jnp.float32),
            jnp.zeros((PX, 1), jnp.int32),
        )
        c_final, N, Tstop, color, ncontrib = jax.lax.while_loop(
            cond, body, init
        )

        # Early termination leaves the prefetched next-chunk DMA in flight;
        # exiting with an outstanding DMA aborts the TPU. Drain it.
        @pl.when(c_final < n_chunks)
        def _():
            get_dma(jax.lax.rem(c_final, 2), c_final).wait()

        color_ref[0, i] = color.reshape(3 * PX)
        finalT_ref[0, i] = Tstop[:, 0]
        ncontrib_ref[0, i] = ncontrib[:, 0]
        return 0

    jax.lax.fori_loop(0, TPB, tile_body, 0)


def _bwd_kernel(
    # scalar prefetch
    starts_ref,
    counts_ref,
    x0_ref,
    y0_ref,
    # inputs
    inst_ref,  # (NROWS, R_pad) HBM
    color_full_ref,  # (1, TPB, 3·PX) — forward output incl. background
    dcolor_ref,  # (1, TPB, 3·PX)
    zeros_ref,  # (NROWS, R_pad) HBM — aliased to dinst_ref, unused
    # outputs
    dinst_ref,  # (NROWS, R_pad) HBM (zero-initialized via alias)
    heads_ref,  # (1, TPB, NROWS·CHUNK) — each tile's first-chunk gradients
    # scratch
    buf,  # (2, NROWS, CHUNK) VMEM
    gbuf,  # (2, NROWS, CHUNK) VMEM (double-buffered write-back)
    sems,  # DMA(2)
    out_sem,  # DMA(2)
):
    """Gradient chunks are written at the instances' *slab* positions. In the
    compact layout, consecutive tiles can share a 128-lane boundary chunk —
    and that shared chunk is always some tile's FIRST chunk. So each tile
    writes chunks 1..n−1 directly (provably collision-free: a chunk interior
    to one tile belongs to no other) and routes chunk 0 through a private
    per-tile ``heads`` output; a trivial scatter-add outside the kernel
    merges heads into the slab. No cross-tile kernel state, no conditional
    semaphore waits."""
    pid = pl.program_id(0)

    def tile_loop(i, _):
        _bwd_tile(
            pid * TPB + i,
            i,
            starts_ref,
            counts_ref,
            x0_ref,
            y0_ref,
            inst_ref,
            color_full_ref,
            dcolor_ref,
            dinst_ref,
            heads_ref,
            buf,
            gbuf,
            sems,
            out_sem,
        )
        return 0

    jax.lax.fori_loop(0, TPB, tile_loop, 0)


def _bwd_chunk_math(
    data, Ub, Ut, cx, cy, count, kbase, dL, dLT, dL_dot_Cfull, N,
    dL_dot_prefix,
):
    """One chunk of the backward: per-instance gradient rows + carries.

    Returns (gdata (NROWS, CHUNK), N_new, dL_dot_prefix_new).
    """
    a, live, opG, xg, yg, A, B, C, op, _ = _chunk_alpha(
        data, Ub, cx, cy, count, kbase
    )
    one_m = 1.0 - a
    l = jnp.log1p(-a)
    N_excl = N * jnp.exp(_lane_cumsum(l, exclusive=True))
    N_incl = N_excl * one_m
    contrib = N_incl >= T_STOP
    gate = live & contrib
    w = a * N_excl * contrib
    rgbT = data[_R : _B3 + 1, :]  # (3, CHUNK)

    # u_i = Σ_ch dL_ch·c_i_ch per (pixel, instance)
    u = jnp.dot(
        dL, rgbT, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Σ_ch dL_ch·cumsum_incl(w·c_ch) — the per-row dL scale commutes with
    # the (linear) triangular multiply, so the 3 per-channel tri-matmuls
    # collapse into one: (w ⊙ u) @ M
    dl_wc_cum = _lane_cumsum(w * u)
    # B_i = C_full − prefix − wc_prefix_incl  (dotted with dL)
    dL_dot_B = dL_dot_Cfull - dL_dot_prefix - dl_wc_cum

    dL_da = jnp.where(gate, N_excl * u - dL_dot_B / one_m, 0.0)

    # All six geometry rows are moments of V = dL_dG·G = dL_dα·op·G
    # (0.99-clamp ignored, reference parity, backward.cu:821):
    #   d x  = −(A·ΣVdx + B·ΣVdy),  d y = −(C·ΣVdy + B·ΣVdx)
    #   dA   = −½ ΣVdx², dB = −ΣVdxdy, dC = −½ ΣVdy²,  d op = ΣV / op
    # and with dx = xg − u, dy = yg − v every ΣV·dxᵃdyᵇ moment expands
    # over the SAME static pixel basis as the forward exponent:
    # S = Uᵀ @ V gives [ΣV, ΣVu, ΣVv, ΣVu², ΣVuv, ΣVv²] in ONE MXU
    # matmul; the dx/dy recombination is all narrow (1, CHUNK) algebra.
    # (Replaces two wide products + six sublane reductions per chunk.)
    V = dL_da * opG
    S = jnp.dot(
        Ut, V, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (6, CHUNK)
    S0, S1, S2 = S[0:1, :], S[1:2, :], S[2:3, :]
    S3, S4, S5 = S[3:4, :], S[4:5, :], S[5:6, :]
    sVdx = xg * S0 - S1
    sVdy = yg * S0 - S2
    sVdxdx = xg * xg * S0 - 2.0 * xg * S1 + S3
    sVdxdy = xg * yg * S0 - xg * S2 - yg * S1 + S4
    sVdydy = yg * yg * S0 - 2.0 * yg * S2 + S5
    inv_op = jnp.where(op > 0.0, 1.0 / op, 0.0)
    # per-instance color grads: one (3, PX) @ (PX, CHUNK) matmul
    drgb = jnp.dot(
        dLT, w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (3, CHUNK)

    zero_row = jnp.zeros((1, CHUNK), jnp.float32)
    rows = [
        -(A * sVdx + B * sVdy),  # d x
        -(C * sVdy + B * sVdx),  # d y
        -0.5 * sVdxdx,  # dA
        -sVdxdy,  # dB
        -0.5 * sVdydy,  # dC
        S0 * inv_op,  # d opacity
        drgb[0:1, :],
        drgb[1:2, :],
        drgb[2:3, :],
    ]
    rows += [zero_row] * (NROWS - len(rows))
    gdata = jnp.concatenate(rows, axis=0)

    # prefix update: Σ_ch dL_ch · Σ_{j≤chunk-end} w_j c_j_ch — exactly the
    # last lane of the inclusive (w·u) cumsum (Σ_i w_i·(Σ_ch dL_ch c_i_ch))
    dL_dot_prefix = dL_dot_prefix + dl_wc_cum[:, CHUNK - 1 :]
    # ungated log-transmittance total = last lane of the tri cumsum
    N = N_excl[:, CHUNK - 1 :] * one_m[:, CHUNK - 1 :]
    return gdata, N, dL_dot_prefix


def _bwd_tile(
    t,
    i,
    starts_ref,
    counts_ref,
    x0_ref,
    y0_ref,
    inst_ref,
    color_full_ref,
    dcolor_ref,
    dinst_ref,
    heads_ref,
    buf,
    gbuf,
    sems,
    out_sem,
):
    start = starts_ref[t]
    count = counts_ref[t]
    cx = x0_ref[t].astype(jnp.float32) + _HALF
    cy = y0_ref[t].astype(jnp.float32) + _HALF
    Ub = _u_basis().astype(jnp.bfloat16)
    Ut = _ut_basis()  # (6, PX) f32 for the V-moment matmul
    base = (start // CHUNK) * CHUNK
    head = start - base
    n_chunks = pl.cdiv(head + count, CHUNK)
    bchunk = base // CHUNK

    # unpack channel-plane rows once per tile (lane-packed to keep the
    # HBM arrays and DMAs unpadded)
    color_full = color_full_ref[0, i].reshape(3, PX).T  # (PX, 3)
    dLT = dcolor_ref[0, i].reshape(3, PX)  # (3, PX)
    dL = dLT.T  # (PX, 3)
    dL_dot_Cfull = jnp.sum(dL * color_full, axis=1, keepdims=True)  # (PX,1)

    def get_dma(slot, c):
        off = pl.multiple_of(base + c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, CHUNK)],
            buf.at[slot],
            sems.at[slot],
        )

    def out_dma(c):
        # direct write of chunk c ≥ 1 at its global slab chunk (bchunk + c)
        off = pl.multiple_of((bchunk + c) * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            gbuf.at[jax.lax.rem(c, 2)],
            dinst_ref.at[:, pl.ds(off, CHUNK)],
            out_sem.at[jax.lax.rem(c, 2)],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    # padded/empty tiles still own a heads slot — keep it zero
    @pl.when(count == 0)
    def _():
        heads_ref[0, i] = jnp.zeros((NROWS * CHUNK,), jnp.float32)

    def cond(carry):
        c, N, _ = carry
        return (c < n_chunks) & (jnp.max(N) >= T_STOP)

    def body(carry):
        c, N, dL_dot_prefix = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            get_dma(1 - slot, c + 1).start()

        get_dma(slot, c).wait()
        gdata, N, dL_dot_prefix = _bwd_chunk_math(
            buf[slot], Ub, Ut, cx, cy, count, c * CHUNK - head,
            dL, dLT, dL_dot_Cfull, N, dL_dot_prefix,
        )

        # chunk 0 (possibly shared with the previous tile) → private heads
        # slot, merged by a scatter-add outside the kernel
        @pl.when(c == 0)
        def _():
            heads_ref[0, i] = gdata.reshape(NROWS * CHUNK)

        # interior chunks → direct double-buffered write-back (the classic
        # pattern: before writing chunk c, wait for the chunk-(c−2) DMA that
        # used the same gbuf slot)
        @pl.when(c >= 1)
        def _():
            @pl.when(c >= 3)
            def _():
                out_dma(c - 2).wait()

            gbuf[jax.lax.rem(c, 2)] = gdata
            out_dma(c).start()

        return c + 1, N, dL_dot_prefix

    init = (
        jnp.int32(0),
        jnp.ones((PX, 1), jnp.float32),
        jnp.zeros((PX, 1), jnp.float32),
    )
    c_final, _, _ = jax.lax.while_loop(cond, body, init)

    # drain the prefetched in-flight read DMA on early termination (see fwd)
    @pl.when(c_final < n_chunks)
    def _():
        get_dma(jax.lax.rem(c_final, 2), c_final).wait()

    # drain this tile's direct write-backs: chunks c_final−2 and c_final−1
    # are the only ones not yet waited (body waits chunk c−2 at chunk c)
    @pl.when(c_final - 2 >= 1)
    def _():
        out_dma(c_final - 2).wait()

    @pl.when(c_final - 1 >= 1)
    def _():
        out_dma(c_final - 1).wait()


def _bwd_kernel_fused(
    # scalar prefetch
    starts_ref,
    counts_ref,
    x0_ref,
    y0_ref,
    # inputs
    inst_ref,  # (NROWS, R_pad) HBM
    ids_ref,  # (1, R_pad) int32 HBM — slab position → gaussian id
    color_full_ref,  # (1, TPB, 3·PX)
    dcolor_ref,  # (1, TPB, 3·PX)
    # outputs
    acc_ref,  # (P_pad // 8, 128) VMEM — SAME block every program
    # scratch
    buf,  # (2, NROWS, CHUNK) VMEM
    idbuf,  # (2, 1, CHUNK) SMEM
    gscr,  # (CHUNK, 128) VMEM — transposed gradient staging, lanes 0:16
    sems,  # DMA(2)
    idsems,  # DMA(2)
):
    """Backward with the instance→Gaussian reduction FUSED into the kernel.

    Instead of writing per-instance gradient rows back to HBM (and paying a
    serial ~17 ns/row XLA scatter-add afterwards), each chunk's gradient
    columns are accumulated directly into a VMEM-resident per-Gaussian
    table. Mosaic forbids dynamic LANE offsets (they must be 128-aligned),
    so the table is laid out (P//8, 128): gaussian g owns row g//8, lane
    block [(g%8)·16, +16) — the per-instance add is then a dynamic-SUBLANE
    read-modify-write (allowed) of the instance's gradient row rotated into
    its lane block with a dynamic `pltpu.roll`. The TPU grid is sequential,
    so the accumulator block (same index every program) persists across
    programs and carries no races; a chunk shared by two tiles is simply
    visited twice, each visit adding only its own tile's gated
    (elsewhere-zero) lanes — the heads/write-back machinery of the unfused
    kernel disappears entirely. Requires the accumulator to fit VMEM:
    P ≤ ~160k f32 rows (see FUSED_REDUCE_MAX_P).
    """
    pid = pl.program_id(0)
    Ub = _u_basis().astype(jnp.bfloat16)
    Ut = _ut_basis()

    @pl.when(pid == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        gscr[:] = jnp.zeros_like(gscr)  # lanes ≥ NROWS stay zero throughout

    def tile_loop(i, _):
        t = pid * TPB + i
        start = starts_ref[t]
        count = counts_ref[t]
        cx = x0_ref[t].astype(jnp.float32) + _HALF
        cy = y0_ref[t].astype(jnp.float32) + _HALF
        base = (start // CHUNK) * CHUNK
        head = start - base
        n_chunks = pl.cdiv(head + count, CHUNK)

        color_full = color_full_ref[0, i].reshape(3, PX).T  # (PX, 3)
        dLT = dcolor_ref[0, i].reshape(3, PX)  # (3, PX)
        dL = dLT.T
        dL_dot_Cfull = jnp.sum(dL * color_full, axis=1, keepdims=True)

        def get_dma(slot, c):
            off = pl.multiple_of(base + c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot],
                sems.at[slot],
            )

        def get_iddma(slot, c):
            off = pl.multiple_of(base + c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                ids_ref.at[:, pl.ds(off, CHUNK)], idbuf.at[slot],
                idsems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()
            get_iddma(0, 0).start()

        def cond(carry):
            c, N, _ = carry
            return (c < n_chunks) & (jnp.max(N) >= T_STOP)

        def body(carry):
            c, N, dL_dot_prefix = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                get_dma(1 - slot, c + 1).start()
                get_iddma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            get_iddma(slot, c).wait()
            gdata, N, dL_dot_prefix = _bwd_chunk_math(
                buf[slot], Ub, Ut, cx, cy, count, c * CHUNK - head,
                dL, dLT, dL_dot_Cfull, N, dL_dot_prefix,
            )

            # per-instance accumulate: gated lanes of other tiles are zero.
            # Stage the chunk's gradients TRANSPOSED (instance-major rows,
            # gradient components in lanes 0:16) so each instance's read is
            # a dynamic-sublane row — Mosaic forbids dynamic lane offsets.
            gscr[:, 0:NROWS] = gdata.T

            def inner(j, _):
                gid = idbuf[slot, 0, j]
                row = gscr[pl.ds(j, 1), :]  # (1, 128), data in lanes 0:16
                rolled = pltpu.roll(row, (gid % 8) * NROWS, axis=1)
                acc_ref[pl.ds(gid // 8, 1), :] += rolled
                return 0

            # Mosaic supports only unroll=1 or full unroll here; full unroll
            # of 128 short iterations bloats the program on a wedge-prone
            # remote compiler, so keep the rolled loop
            jax.lax.fori_loop(0, CHUNK, inner, 0)
            return c + 1, N, dL_dot_prefix

        init = (
            jnp.int32(0),
            jnp.ones((PX, 1), jnp.float32),
            jnp.zeros((PX, 1), jnp.float32),
        )
        c_final, _, _ = jax.lax.while_loop(cond, body, init)

        # drain in-flight prefetches on early termination
        @pl.when(c_final < n_chunks)
        def _():
            get_dma(jax.lax.rem(c_final, 2), c_final).wait()
            get_iddma(jax.lax.rem(c_final, 2), c_final).wait()

        return 0

    jax.lax.fori_loop(0, TPB, tile_loop, 0)


# VMEM budget for the fused-reduce accumulator: (NROWS, P) f32 must fit the
# ~16 MB VMEM alongside the chunk buffers — 160k gaussians ≈ 10 MB.
FUSED_REDUCE_MAX_P = 160 * 1024


def composite_pallas_bwd_fused(
    inst_T: jnp.ndarray,
    ids: jnp.ndarray,  # (R_pad,) int32 slab → gaussian
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    x0: jnp.ndarray,
    y0: jnp.ndarray,
    color_full: jnp.ndarray,  # (T, 3, PX)
    dcolor: jnp.ndarray,  # (T, 3, PX)
    num_tiles: int,
    num_gaussians: int,
    interpret: bool = False,
):
    """Fused-reduce backward → (P_pad, 9) per-GAUSSIAN gradients."""
    n_prog = -(-num_tiles // TPB)
    t_pad = n_prog * TPB
    starts, counts, x0, y0 = (
        jnp.pad(a, (0, t_pad - num_tiles)) for a in (starts, counts, x0, y0)
    )
    color_full = jnp.pad(
        color_full.reshape(num_tiles, 3 * PX),
        ((0, t_pad - num_tiles), (0, 0)),
    ).reshape(n_prog, TPB, 3 * PX)
    dcolor = jnp.pad(
        dcolor.reshape(num_tiles, 3 * PX), ((0, t_pad - num_tiles), (0, 0))
    ).reshape(n_prog, TPB, 3 * PX)
    p_pad = -(-num_gaussians // CHUNK) * CHUNK
    r_pad = inst_T.shape[1]
    ids = jnp.pad(ids, (0, r_pad - ids.shape[0])).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, TPB, 3 * PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TPB, 3 * PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (p_pad // 8, 128), lambda i, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.SMEM((2, 1, CHUNK), jnp.int32),
            pltpu.VMEM((CHUNK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (acc,) = pl.pallas_call(
        _bwd_kernel_fused,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((p_pad // 8, 128), jnp.float32)],
        interpret=interpret,
    )(starts, counts, x0, y0, inst_T, ids[None, :], color_full, dcolor)
    # row g//8, lane block (g%8)·16 → (P, 16) rows, keep the 9 real rows
    return acc.reshape(p_pad, NROWS)[:num_gaussians, :9]  # (P, 9)


def _pad_instances(max_instances: int) -> int:
    return max_instances + CHUNK


def composite_pallas_fwd(
    inst_T: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    x0: jnp.ndarray,
    y0: jnp.ndarray,
    num_tiles: int,
    interpret: bool = False,
    want_ncontrib: bool = True,
):
    """Run the forward kernel. inst_T is (NROWS, R_pad).

    ``want_ncontrib=False`` skips the per-pair contribution-rank bookkeeping
    (a diagnostic output nothing in training consumes — the backward
    recomputes transmittances itself, unlike the reference whose backward
    seeds from n_contrib, `backward.cu:700-712`) and returns zeros for it;
    ~10 of ~40 VPU element-ops per pixel-instance pair.
    """
    n_prog = -(-num_tiles // TPB)
    t_pad = n_prog * TPB
    starts, counts, x0, y0 = (
        jnp.pad(a, (0, t_pad - num_tiles)) for a in (starts, counts, x0, y0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, TPB, 3 * PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TPB, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TPB, PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, finalT, ncontrib = pl.pallas_call(
        functools.partial(_fwd_kernel, want_ncontrib=want_ncontrib),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_prog, TPB, 3 * PX), jnp.float32),
            jax.ShapeDtypeStruct((n_prog, TPB, PX), jnp.float32),
            jax.ShapeDtypeStruct((n_prog, TPB, PX), jnp.int32),
        ],
        interpret=interpret,
    )(starts, counts, x0, y0, inst_T)
    return (
        color.reshape(t_pad, 3 * PX)[:num_tiles].reshape(num_tiles, 3, PX),
        finalT.reshape(t_pad, PX)[:num_tiles],
        ncontrib.reshape(t_pad, PX)[:num_tiles],
    )


def composite_pallas_bwd(
    inst_T: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    x0: jnp.ndarray,
    y0: jnp.ndarray,
    color_full: jnp.ndarray,  # (T, 3, PX)
    dcolor: jnp.ndarray,  # (T, 3, PX)
    num_tiles: int,
    interpret: bool = False,
):
    """Run the backward kernel → (NROWS, R_pad) per-instance gradients."""
    n_prog = -(-num_tiles // TPB)
    t_pad = n_prog * TPB
    starts, counts, x0, y0 = (
        jnp.pad(a, (0, t_pad - num_tiles)) for a in (starts, counts, x0, y0)
    )
    color_full = jnp.pad(
        color_full.reshape(num_tiles, 3 * PX),
        ((0, t_pad - num_tiles), (0, 0)),
    ).reshape(n_prog, TPB, 3 * PX)
    dcolor = jnp.pad(
        dcolor.reshape(num_tiles, 3 * PX), ((0, t_pad - num_tiles), (0, 0))
    ).reshape(n_prog, TPB, 3 * PX)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, TPB, 3 * PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TPB, 3 * PX), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, TPB, NROWS * CHUNK),
                lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    zeros = jnp.zeros_like(inst_T)
    dinst, heads = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(inst_T.shape, jnp.float32),
            jax.ShapeDtypeStruct((n_prog, TPB, NROWS * CHUNK), jnp.float32),
        ],
        input_output_aliases={7: 0},  # zeros (after 4 prefetch + 3 inputs)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, counts, x0, y0, inst_T, color_full, dcolor, zeros)
    # merge each tile's first-chunk gradients into the slab. A tile's first
    # chunk may be shared with its neighbours (unaligned compact layout), so
    # this is a (tiny, T-row) scatter-ADD over global chunk indices.
    r_pad = inst_T.shape[1]
    assert r_pad % CHUNK == 0, r_pad
    heads = heads.reshape(t_pad, NROWS, CHUNK)[:num_tiles]
    bchunk = jnp.clip(starts[:num_tiles] // CHUNK, 0, r_pad // CHUNK - 1)
    dinst3 = dinst.reshape(NROWS, r_pad // CHUNK, CHUNK)
    dinst3 = dinst3.at[:, bchunk, :].add(heads.transpose(1, 0, 2))
    return dinst3.reshape(NROWS, r_pad)


def _bwd_in_specs_patch():  # pragma: no cover - documentation helper
    """`input_output_aliases` indexes the *non-scalar-prefetch* inputs:
    (inst_T=0, color_full=1, dcolor=2, zeros=3)."""


# ---------------------------------------------------------------------------
# Differentiable wrapper (the Pallas analog of rasterize._composite_tiles)
# ---------------------------------------------------------------------------


def _build_inst(means2d, conic, rgb, opacity, sorted_g, live=None, perm=None):
    """Gather per-Gaussian state into the (NROWS, R_pad) instance slab.

    Packs the 9 per-Gaussian fields into one (P, NROWS) table and fetches it
    with a single row gather — TPU row gathers are ~9× faster than the naive
    9 per-column gathers; the (R, NROWS)→(NROWS, R) transpose fuses free.

    With ``perm`` (depth-presorted binning, `bin_instances_packed`),
    ``sorted_g`` holds depth RANKS: the table rows are permuted into depth
    order first (one extra P-row gather, ≪ the R-row main gather).

    With ``live`` (the slab high-water mark max(starts+counts), traced), the
    gather runs as a dynamic-trip chunked while_loop that stops at the live
    prefix — cost ∝ live instances instead of the static cap (the kernels
    never read past the chunk containing ``live``; dead rows stay zero).
    """
    p = opacity.shape[0]
    packed = jnp.concatenate(
        [
            means2d,  # x, y
            conic,  # A, B, C
            opacity[:, None],
            rgb,  # r, g, b
            jnp.zeros((p, NROWS - 9), means2d.dtype),
        ],
        axis=-1,
    )  # (P, NROWS)
    if perm is not None:
        packed = packed[perm]
    r = sorted_g.shape[0]
    CH = 1 << 16
    # live-bounding pays a while_loop + unfused-slice tax (~1.5 ms measured
    # at bench scale) that only amortizes when the static slab is much
    # larger than the live prefix — i.e. generous/protocol-sized caps. For
    # tight slabs (aligned_cap retuned to live) the plain fused gather wins.
    if live is None or r % CH != 0 or r // CH <= 24:
        rows = packed[sorted_g].T  # (NROWS, R)
        return jnp.pad(rows, ((0, 0), (0, CHUNK)))
    n_chunks = jnp.minimum((live + CH - 1) // CH, r // CH)

    def _body(carry):
        out, i = carry
        off = i * CH
        g_c = jax.lax.dynamic_slice(sorted_g, (off,), (CH,))
        rows_c = packed[g_c].T  # (NROWS, CH)
        out = jax.lax.dynamic_update_slice(out, rows_c, (0, off))
        return out, i + 1

    out, _ = jax.lax.while_loop(
        lambda c: c[1] < n_chunks,
        _body,
        (jnp.zeros((NROWS, r + CHUNK), packed.dtype), jnp.int32(0)),
    )
    return out


def _int_ct(x):
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def composite_instances(
    means2d,
    conic,
    rgb,
    opacity,
    bg,
    sorted_g,
    starts,
    counts,
    x0,
    y0,
    sorted_e,
    seg_lo,
    seg_hi,
    perm,
    inv_perm,
    num_tiles,
    interpret,
    want_ncontrib=True,
    fused_reduce=False,
):
    """Pallas-backed compositing of depth-sorted instances.

    Returns (color (T, 3, PX) incl. background, final_T (T, PX),
    n_contrib (T, PX) — zeros when ``want_ncontrib=False``).
    Differentiable in the first four args.

    ``sorted_e``/``seg_lo``/``seg_hi`` (binning with_emission) enable the
    gather-based gradient reduction; pass None to fall back to a
    scatter-add over ``sorted_g``. ``perm``/``inv_perm`` (from
    `bin_instances_packed`) declare that ``sorted_g`` holds depth ranks.
    """
    inst_T = _build_inst(
        means2d, conic, rgb, opacity, sorted_g, jnp.max(starts + counts),
        perm,
    )
    color, finalT, ncontrib = composite_pallas_fwd(
        inst_T, starts, counts, x0, y0, num_tiles, interpret, want_ncontrib
    )
    color = color + finalT[:, None, :] * bg[None, :, None]
    return color, finalT, ncontrib


def _ci_fwd(
    means2d, conic, rgb, opacity, bg, sorted_g, starts, counts, x0, y0,
    sorted_e, seg_lo, seg_hi, perm, inv_perm, num_tiles, interpret,
    want_ncontrib=True, fused_reduce=False,
):
    inst_T = _build_inst(
        means2d, conic, rgb, opacity, sorted_g, jnp.max(starts + counts),
        perm,
    )
    color, finalT, ncontrib = composite_pallas_fwd(
        inst_T, starts, counts, x0, y0, num_tiles, interpret, want_ncontrib
    )
    color_full = color + finalT[:, None, :] * bg[None, :, None]
    res = (
        inst_T,
        sorted_g,
        starts,
        counts,
        x0,
        y0,
        sorted_e,
        seg_lo,
        seg_hi,
        perm,
        inv_perm,
        color_full,
        bg,
        means2d.shape[0],
    )
    return (color_full, finalT, ncontrib), res


def gather_reduce_rows(rows, sorted_e, seg_lo, seg_hi):
    """Deterministic gather-based instance → Gaussian gradient reduction.

    ``sorted_e`` maps slab position → survivor rank (unique except the
    sort-last E_SENTINEL; binning._emission_segments). TPU scatters are
    serial (~17 ns/row) but row GATHERS are ~4× cheaper, so:
      1) invert the map with one cheap unstable 1-key sort
         (rank, slabpos) — slabpos[i] = slab row of survivor i;
      2) gather gradient rows into survivor-rank order — each
         Gaussian's survivors are CONTIGUOUS there;
      3) per-Gaussian sums = cumsum + segment diff at seg_lo/seg_hi
         (two bandwidth passes, no scatter).
    Rank density survives cap-trimming: sorted_e stays full-length in
    rasterize; trimmed slab rows simply read the zero pad row.

    Numerics — blocked segment sums, NOT one global cumsum+diff: a
    single f32 cumsum over ~10⁶ rows makes every segment a difference of
    two huge prefixes, and the conic gradient rows (dA/dB/dC span ~10⁴
    in magnitude) lose up to 5×10⁻² relative on rotation/scaling at
    bench scale (caught by check_jit_parity's full-scale leg on chip;
    the error is random-walk — ∝ √prefix — so chunk-level blocking alone
    measured only 4× better). Instead:

    * rank rows are prefix-summed only WITHIN 128-row blocks (exclusive,
      batched) — every partial-block term in a segment difference shares
      a ≤127-row base, error ~eps·√128·‖local rows‖;
    * every block fully inside one Gaussian's segment (segments tile
      rank space contiguously, so ownership is just two searchsorteds
      over the non-decreasing seg_lo) contributes its 128-row total via
      a per-Gaussian scatter-add — R/128 ≈ 10k rows, ~0.2 ms, exact
      per-Gaussian accumulation order like the scatter path.

    No global prefix appears anywhere. Grads agree with the scatter path
    to accumulation-order noise (tests/test_gather_reduce.py), not
    bitwise.
    """
    r = rows.shape[0]
    r_slab = sorted_e.shape[0]
    iota = jnp.arange(r_slab, dtype=jnp.int32)
    se, slabpos = jax.lax.sort(
        (sorted_e, iota), num_keys=1, is_stable=False
    )
    # number of live survivor ranks (sentinels sort after all of them)
    live = jnp.searchsorted(
        se, jnp.int32(1 << 29), side="left"
    ).astype(jnp.int32)
    rows_pad = jnp.concatenate(
        [rows, jnp.zeros((r_slab - r + 1, 9), rows.dtype)]
    )
    # live-bound chunked gather (cost ∝ survivors, not the cap)
    CH_G = 1 << 16
    n_full = r_slab // CH_G
    if n_full * CH_G != r_slab or n_full <= 1:
        # ragged caps (tests): prefix magnitudes are small, plain cumsum
        grows = rows_pad[jnp.minimum(slabpos, r_slab)]
        cs = jnp.concatenate(
            [jnp.zeros((1, 9)), jnp.cumsum(grows, axis=0)], axis=0
        )
        return cs[seg_hi] - cs[seg_lo]

    n_chunks = jnp.minimum((live + CH_G - 1) // CH_G, n_full)
    SB = 128  # numerics block: in-block prefixes + per-block totals

    def _body(carry):
        L_a, tot_a, i = carry
        off = i * CH_G
        sp = jax.lax.dynamic_slice(slabpos, (off,), (CH_G,))
        grows_c = rows_pad[jnp.minimum(sp, r_slab)]
        g3 = grows_c.reshape(CH_G // SB, SB, 9)
        cs3 = jnp.cumsum(g3, axis=1)
        L_a = jax.lax.dynamic_update_slice(
            L_a, (cs3 - g3).reshape(CH_G, 9), (off, 0)  # exclusive
        )
        tot_a = jax.lax.dynamic_update_slice(
            tot_a, cs3[:, SB - 1, :], (off // SB, 0)
        )
        return L_a, tot_a, i + 1

    L, tot, _ = jax.lax.while_loop(
        lambda c: c[2] < n_chunks,
        _body,
        (
            jnp.zeros((r_slab, 9)),
            jnp.zeros((r_slab // SB, 9)),
            jnp.int32(0),
        ),
    )
    L_pad = jnp.concatenate([L, jnp.zeros((1, 9))])  # L[r_slab] = 0

    # blocks fully inside one segment → scatter their totals to the owner.
    # Segments tile rank space in Gaussian order, so seg_lo is
    # non-decreasing and ownership is a searchsorted; ties (empty
    # segments share their successor's lo) resolve to the real owner
    # because the containing Gaussian is always last in an equal-lo run.
    P = seg_lo.shape[0]
    nb = r_slab // SB
    bstart = jnp.arange(nb, dtype=jnp.int32) * SB
    gs = jnp.searchsorted(seg_lo, bstart, side="right").astype(jnp.int32) - 1
    ge = jnp.searchsorted(
        seg_lo, bstart + (SB - 1), side="right"
    ).astype(jnp.int32) - 1
    # gs==ge (same lo-run) alone is NOT containment: the final nonempty
    # segment has no successor lo to bound its tail, so its partial tail
    # block — and every all-sentinel block past `live` — would be owned
    # AND re-added via Lhi (double count; ADVICE r4 #1). Require the
    # block to END inside the owner's segment too.
    owner = jnp.where(
        (gs == ge)
        & (gs >= 0)
        & (bstart + SB <= seg_hi[jnp.clip(gs, 0, P - 1)]),
        gs,
        P,
    )
    mid = jnp.zeros((P, 9)).at[owner].add(tot, mode="drop")

    # partial-block head/tail pieces (≤127-row local prefixes each)
    bl = seg_lo // SB
    bh = seg_hi // SB
    Llo = L_pad[seg_lo]
    Lhi = L_pad[seg_hi]
    head = jnp.where(
        ((seg_lo % SB) != 0)[:, None],
        tot[jnp.minimum(bl, nb - 1)] - Llo,
        0.0,
    )
    return jnp.where(
        (bl == bh)[:, None],
        Lhi - Llo,  # same-block segment: no owned blocks, no head/tail
        head + mid + Lhi,
    )


def _ci_bwd(num_tiles, interpret, want_ncontrib, fused_reduce, res, cts):
    (
        inst_T,
        sorted_g,
        starts,
        counts,
        x0,
        y0,
        sorted_e,
        seg_lo,
        seg_hi,
        perm,
        inv_perm,
        color_full,
        bg,
        P,
    ) = res
    dcolor = cts[0]
    # CONTRACT: color is the ONLY differentiable output. final_T is a
    # diagnostic (rasterize stop_gradients it; reference keeps it as
    # non-diff residual state, rasterizer_impl.cu:418-433) and n_contrib is
    # integer (float0 cotangent by construction). A future loss term that
    # consumes final_T directly (opacity regularization, T-weighted depth
    # supervision) would silently train with ZERO gradient through it —
    # set OMNIGS_CHECK_COTANGENTS=1 to poison the gradients with NaN when a
    # nonzero final_T cotangent arrives, so that failure is loud
    # (tests/test_pallas_raster.py::test_final_t_cotangent_check).
    if _os.environ.get("OMNIGS_CHECK_COTANGENTS", "0") == "1":
        ct_T = cts[1]
        if getattr(ct_T, "dtype", None) not in (None, jax.dtypes.float0):
            bad = jnp.any(ct_T != 0)
            dcolor = dcolor + jnp.where(bad, jnp.nan, 0.0)
    if fused_reduce and sorted_e is None and P <= FUSED_REDUCE_MAX_P:
        # per-Gaussian grads straight out of the kernel (reduction fused
        # into the backward's chunk loop — no HBM grad slab, no scatter)
        acc = composite_pallas_bwd_fused(
            inst_T, sorted_g, starts, counts, x0, y0, color_full, dcolor,
            num_tiles, P, interpret,
        )
        return _ci_bwd_tail(acc, sorted_e, seg_lo, seg_hi, perm, inv_perm,
                            sorted_g, starts, counts, x0, y0, bg)
    dinst = composite_pallas_bwd(
        inst_T, starts, counts, x0, y0, color_full, dcolor, num_tiles,
        interpret,
    )
    r = sorted_g.shape[0]
    rows = dinst[:9, :r].T  # (R, 9) — only the meaningful gradient rows
    if sorted_e is not None:
        acc = gather_reduce_rows(rows, sorted_e, seg_lo, seg_hi)
    else:
        # Live-bound chunked reduction. XLA's scatter-add on TPU is serial
        # per row and costs ~17.5 ns/row over the STATIC slab length
        # (BENCH.md primitive costs) — a dynamic-trip-count while_loop over
        # fixed-size chunks pays only for rows below the live high-water
        # mark max(starts+counts). Every row the kernel can write lies
        # below it (tight compact segments; head-chunk merge lanes beyond a
        # segment are masked to zero), and dinst is donated from zeros, so
        # skipped rows contribute exactly the zero the one-shot scatter
        # added. Big win early in training when the slab is nearly empty;
        # at worst (full slab) one extra chunk of overhead.
        CH_R = 1 << 16
        r_pad = -(-r // CH_R) * CH_R
        ids_p = jnp.concatenate(
            [sorted_g, jnp.full((r_pad - r,), P, jnp.int32)]
        )
        rows_p = jnp.concatenate(
            [rows, jnp.zeros((r_pad - r, 9), rows.dtype)]
        )
        live = jnp.max(starts + counts)
        n_chunks = jnp.minimum((live + CH_R - 1) // CH_R, r_pad // CH_R)

        def _add_chunk(carry):
            acc, i = carry
            off = i * CH_R
            ids_c = jax.lax.dynamic_slice(ids_p, (off,), (CH_R,))
            rows_c = jax.lax.dynamic_slice(rows_p, (off, 0), (CH_R, 9))
            return acc.at[ids_c].add(rows_c, mode="drop"), i + 1

        acc, _ = jax.lax.while_loop(
            lambda c: c[1] < n_chunks,
            _add_chunk,
            (jnp.zeros((P, 9)), jnp.int32(0)),
        )
    return _ci_bwd_tail(acc, sorted_e, seg_lo, seg_hi, perm, inv_perm,
                        sorted_g, starts, counts, x0, y0, bg)


def _ci_bwd_tail(acc, sorted_e, seg_lo, seg_hi, perm, inv_perm, sorted_g,
                 starts, counts, x0, y0, bg):
    if inv_perm is not None:
        # depth-presorted binning: acc rows are per depth RANK; map back to
        # original gaussian order with one P-row gather
        acc = acc[inv_perm]
    dm2d = acc[:, 0:2]
    dcon = acc[:, 2:5]
    dop = acc[:, 5]
    drgb = acc[:, 6:9]
    out_e = None if sorted_e is None else _int_ct(sorted_e)
    out_lo = None if seg_lo is None else _int_ct(seg_lo)
    out_hi = None if seg_hi is None else _int_ct(seg_hi)
    out_p = None if perm is None else _int_ct(perm)
    out_ip = None if inv_perm is None else _int_ct(inv_perm)
    return (
        dm2d,
        dcon,
        drgb,
        dop,
        jnp.zeros_like(bg),
        _int_ct(sorted_g),
        _int_ct(starts),
        _int_ct(counts),
        _int_ct(x0),
        _int_ct(y0),
        out_e,
        out_lo,
        out_hi,
        out_p,
        out_ip,
    )


composite_instances.defvjp(_ci_fwd, _ci_bwd)
