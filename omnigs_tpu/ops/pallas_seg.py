"""Segmented-chunk Pallas kernels: one pass per 128-lane slab chunk.

The tile-major kernels (ops/pallas_raster.py) walk each tile's instance
segment in its own chunk loop; at ~142 instances/tile that means ~2.1
chunk-passes per tile and ~47% masked lanes (BENCH.md r4 tile-size
analysis) — padding the r4 tile-size analysis declared workload-bound.
These kernels instead walk the slab LINEARLY: every 128-lane chunk is
processed exactly once, carrying the tail of one tile and the heads of
the next tiles in the same pass (VERDICT r4 next-round #1; masked lanes
drop to ~2.4%). The production design, in the order the data flows:

* **8-granular layout** (`binning.segment_relay`): every tile's segment
  is padded to a multiple of 8 lanes, so a chunk spans ≤ 16 distinct
  tiles — a *static* bound (KS) for the per-chunk tile window. The relay
  is two telescoped scatter+cumsum passes plus ONE live-bound payload
  gather (on the packed-key path the gathered sort key yields both the
  depth rank and, via its tile field, lane validity).
* **Ride-row windows**: the per-lane dense-tile index and tile id ride
  the slab as two extra f32 rows, so one-hot segment masks, per-lane
  tile centers (cx, cy) and liveness come from (1, CHUNK)-shaped
  compares; segment equality is one native (CHUNK, CHUNK) broadcast-
  transpose-compare. (A scalar-loop window build cost ~24 (CHUNK, 1)-
  shaped ops per chunk — 16 VPU sub-ops each — and dominated v1.)
* **Segmented triangular cumsum**: in-chunk transmittance uses
  tri ∧ (seg_i == seg_j) — still 0/1, so the exact-in-bf16 3-pass split
  survives unchanged.
* **Boundary re-read accumulation**: per-tile color (3 rows) and gated
  LOG-transmittance (1 row) partials accumulate into per-program VMEM
  staging windows over the DENSE (nonempty) tile enumeration, window
  offsets quantized to 8 rows (Mosaic's dynamic-sublane alignment rule).
  Each program re-reads its 8-row boundary block from the output HBM
  arrays before accumulating — the straddling tile's staged partial IS
  the program-boundary carry, so no carry scratch, no injection, and the
  output DMAs are self-waited (no cross-program DMA state — the round-2
  deadlock lesson). final_T is exponentiated in XLA after the kernel.
* **Column-form chunk carries**: only the ungated transmittance N (and,
  in the backward, the dL·prefix) cross chunk boundaries, as (PX, 1)
  scratch updated from straddler-masked row sums.
* **Channel-major backward windows**: per-tile color_full/dL rows are
  fetched in channel-major blocks; per-lane dL broadcasts come from
  K=KS2 one-hot contractions (MXU pass time scales with K — a K=3·KS2
  masked-rgb contraction measured ~2× dearer), which also turns the
  per-instance color gradients into plain sublane reductions. The
  V-moment matmul runs at 3 bf16 passes (the pixel basis is exact in
  bf16). Gradient chunks are written at their own slab positions exactly
  once — the tile-major backward's heads/scatter-merge machinery has no
  analog here.

Semantics are identical to the tile-major kernels per pixel; summation
*grouping* differs (global chunk boundaries vs per-tile chunk walks), so
outputs agree to f32 accumulation-order noise, not bitwise. `n_contrib`
is not computed (training default `want_ncontrib=False`); the tile-major
kernels remain for it.

Reference analog: `/root/reference/cuda_rasterizer/forward.cu:346-467`,
`backward.cu:672-843` — whose shared-memory staging economics this layout
replaces (one cooperative fetch per 256-instance window per tile there;
one DMA per 128-instance chunk TOTAL here).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omnigs_tpu.ops.binning import SEG_GRAN, E_SENTINEL
from omnigs_tpu.ops.pallas_raster import (
    ALPHA_MAX,
    ALPHA_MIN,
    CHUNK,
    NROWS,
    PX,
    T_STOP,
    TILE,
    _B3,
    _HALF,
    _OP,
    _R,
    _X,
    _Y,
    _A,
    _B,
    _C,
    _int_ct,
    _split3,
    _tri,
    _u_basis,
    _ut_basis,
    ALPHA_MODE,
    gather_reduce_rows,
)

KS = CHUNK // SEG_GRAN  # max distinct tile segments per chunk (16)
# Mosaic proves dynamic sublane offsets only when they are statically a
# multiple of 8, so per-chunk staging windows are quantized to 8 dense
# rows and widened to KS2 entries — the ≤ 8 extra leading rows are tiles
# that completed in earlier chunks, whose masks are empty and whose
# accumulation contribution is exactly zero.
KS2 = KS + 8
# chunks per kernel program: amortizes the self-waited window DMAs;
# env-overridable for on-chip sweeps
CPB = int(_os.environ.get("OMNIGS_CPB", "32"))
# dense-tile window entries per program (+8 for the 8-quantized program
# base, +KS2 for the widened per-chunk window)
WS = KS * CPB + KS2 + 8


def _dot_ab_exact(a_exact_f32, b_f32, dims):
    """dot_general at ~f32 precision where ``a`` is EXACT in bf16 (0/1
    masks): 3 single-pass bf16 matmuls over the 3-split of ``b``."""
    a = a_exact_f32.astype(jnp.bfloat16)
    b0, b1, b2 = _split3(b_f32)
    acc = jax.lax.dot_general(
        a, b0, dimension_numbers=dims, preferred_element_type=jnp.float32
    )
    acc = acc + jax.lax.dot_general(
        a, b1, dimension_numbers=dims, preferred_element_type=jnp.float32
    )
    return acc + jax.lax.dot_general(
        a, b2, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def _dot_ba_exact(b_f32, a_exact_f32, dims):
    """dot_general at ~f32 precision where the RIGHT operand is exact in
    bf16: 3 single-pass bf16 matmuls over the 3-split of the left."""
    a = a_exact_f32.astype(jnp.bfloat16)
    b0, b1, b2 = _split3(b_f32)
    acc = jax.lax.dot_general(
        b0, a, dimension_numbers=dims, preferred_element_type=jnp.float32
    )
    acc = acc + jax.lax.dot_general(
        b1, a, dimension_numbers=dims, preferred_element_type=jnp.float32
    )
    return acc + jax.lax.dot_general(
        b2, a, dimension_numbers=dims, preferred_element_type=jnp.float32
    )


def _cumsum_seg(x, tri_seg):
    """Segmented lane cumsum: x @ (tri ∧ seg-equality), exact-in-bf16
    3-split (the masked triangular matrix is still 0/1)."""
    x0, x1, x2 = _split3(x)
    acc = jnp.dot(x0, tri_seg, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x1, tri_seg, preferred_element_type=jnp.float32)
    return acc + jnp.dot(x2, tri_seg, preferred_element_type=jnp.float32)


def _seg_alpha(data, Ub, cx, cy, live_row):
    """`pallas_raster._chunk_alpha` with per-LANE tile centers (1, CHUNK)
    and window-derived liveness instead of (kbase, count)."""
    A = data[_A : _A + 1, :]
    B = data[_B : _B + 1, :]
    C = data[_C : _C + 1, :]
    op = data[_OP : _OP + 1, :]
    xg = data[_X : _X + 1, :] - cx
    yg = data[_Y : _Y + 1, :] - cy
    if ALPHA_MODE == "mm":
        w1 = A * xg + B * yg
        w2 = B * xg + C * yg
        w0 = -0.5 * (xg * w1 + yg * w2)
        W = jnp.concatenate([w0, w1, w2, -0.5 * A, -B, -0.5 * C], axis=0)
        from omnigs_tpu.ops.pallas_raster import _dot_exact3

        power = _dot_exact3(Ub, W)
    else:
        p = jax.lax.broadcasted_iota(jnp.int32, (PX, 1), 0)
        # single-rounded dx: cx − _HALF = x0 is exact integer algebra
        px = (p % TILE).astype(jnp.float32) + (cx - _HALF)
        py = (p // TILE).astype(jnp.float32) + (cy - _HALF)
        dx = data[_X : _X + 1, :] - px
        dy = data[_Y : _Y + 1, :] - py
        power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
    opG = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, opG)
    live = live_row & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(live, alpha, 0.0)
    return a, live, opG, xg, yg, A, B, C, op


# slab ride rows written by _build_inst_seg (binning.segment_relay values)
_SEG_ROW = 9  # per-lane dense tile index (f32, exact < 2^24)
_TID_ROW = 10  # per-lane global tile id (f32)


def _window_rides(data, ds_ref, dc_ref, t_base8, c, gx, td, tile_lo):
    """Per-chunk tile-window state from the per-lane RIDE rows: one-hot
    segment masks and segment equality come from (1, CHUNK)-shaped
    compares plus one native 128×128 transpose — the earlier
    scalar-loop/maskT construction cost ~24 (CHUNK, 1)-shaped ops per
    chunk (16 VPU sub-ops each), which dominated the whole kernel."""
    segrow = data[_SEG_ROW : _SEG_ROW + 1, :]  # (1, CHUNK) f32 dense idx
    # the tile-id ride is WINDOW-LOCAL (sharded tile windows are contiguous
    # runs of the global row-major grid); tile_lo restores global coords
    tid = data[_TID_ROW : _TID_ROW + 1, :].astype(jnp.int32) + tile_lo
    local = segrow - t_base8.astype(jnp.float32)
    onehot = jnp.concatenate(
        [(local == float(r)).astype(jnp.float32) for r in range(KS2)],
        axis=0,
    )  # (KS2, CHUNK)
    tx = jax.lax.rem(tid, gx)
    ty = tid // gx
    cx = (tx * TILE).astype(jnp.float32) + _HALF
    cy = (ty * TILE).astype(jnp.float32) + _HALF
    live_row = (local >= 0.0) & (local <= float(KS2 - 1))
    # segment equality: broadcast the seg row over rows and compare with
    # its own transpose (one native (CHUNK, CHUNK) transpose — measured
    # FASTER than transposing the (1, CHUNK) row, which Mosaic lowers as
    # an expensive narrow relayout)
    m1 = jnp.broadcast_to(segrow, (CHUNK, CHUNK))
    eq16 = (m1 == m1.T).astype(jnp.bfloat16)
    # straddler: the chunk's last present segment = max local index
    r_last = jnp.maximum(
        jnp.max(jnp.where(live_row, local, -1.0)), 0.0
    ).astype(jnp.int32)
    dil = jnp.minimum(t_base8 + r_last, td - 1)
    straddles = ds_ref[dil] + dc_ref[dil] > (c + 1) * CHUNK
    mask_sl = (local == r_last.astype(jnp.float32)).astype(jnp.float32)
    return onehot, eq16, cx, cy, live_row, r_last, straddles, mask_sl


def _carried_mask(data, ds_ref, t_base, c, td):
    """(1, CHUNK) mask of the chunk's carried-in segment (from the ride
    row), plus the carried flag."""
    carried = ds_ref[jnp.minimum(t_base, td - 1)] < c * CHUNK
    segrow = data[_SEG_ROW : _SEG_ROW + 1, :]
    maskc = (segrow == t_base.astype(jnp.float32)) & carried
    return maskc, carried


def _fwd_seg_kernel(
    # scalar prefetch
    ds_ref,  # (TD,) dense segment start (slab8)
    dc_ref,  # (TD,) dense segment count
    dt_ref,  # (TD,) dense global tile id
    cb_ref,  # (n_chunks,) chunk → first dense tile in window
    live_ref,  # (2,) [number of live chunks, global tile_lo of the window]
    # inputs
    inst_ref,  # (NROWS, R8) HBM
    # outputs (accumulated in place across programs: each program
    # re-reads its 8-row boundary block, so program-boundary straddler
    # partials need no carry state at all)
    out_c_ref,  # (3·TDpad, PX) HBM — dense color rows
    out_t_ref,  # (TDpad, PX) HBM — dense gated LOG-T rows (exp in XLA)
    # scratch
    buf,  # (2, NROWS, CHUNK) VMEM
    stage_c,  # (3·WS, PX) VMEM accumulation window
    stage_t,  # (WS, PX) VMEM accumulation window (log domain)
    carryN,  # (PX, 1) VMEM — ungated transmittance, column form
    sems,  # DMA(2)
    osem,  # DMA(2)
    *,
    gx: int,
    td: int,
):
    p = pl.program_id(0)
    live_chunks = live_ref[0]
    c0 = p * CPB
    self_live = c0 < live_chunks
    Ub = _u_basis().astype(jnp.bfloat16)
    tri_x = _tri(True)  # strict (exclusive), bf16

    @pl.when(p == 0)
    def _():
        carryN[:] = jnp.ones((PX, 1), jnp.float32)

    @pl.when(self_live)
    def _():
        ptb = cb_ref[c0]
        ptb8 = pl.multiple_of((ptb // 8) * 8, 8)
        n_hi = jnp.minimum(live_chunks, c0 + CPB)
        # boundary re-read: the ≤ 8 leading window rows hold earlier
        # programs' results (completed tiles pass through unchanged; the
        # straddler's staged PARTIAL is the program-boundary carry)
        rb_c = pltpu.make_async_copy(
            out_c_ref.at[pl.ds(3 * ptb8, 24), :],
            stage_c.at[0:24, :],
            osem.at[0],
        )
        rb_t = pltpu.make_async_copy(
            out_t_ref.at[pl.ds(ptb8, 8), :],
            stage_t.at[0:8, :],
            osem.at[1],
        )
        rb_c.start()
        rb_t.start()
        stage_c[24:, :] = jnp.zeros((3 * WS - 24, PX), jnp.float32)
        stage_t[8:, :] = jnp.zeros((WS - 8, PX), jnp.float32)

        def get_dma(slot, c):
            off = pl.multiple_of(c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot], sems.at[slot]
            )

        get_dma(jax.lax.rem(c0, 2), c0).start()
        rb_c.wait()
        rb_t.wait()

        @pl.when(p == 0)
        def _():
            # nothing to re-read before the first program
            stage_c[0:24, :] = jnp.zeros((24, PX), jnp.float32)
            stage_t[0:8, :] = jnp.zeros((8, PX), jnp.float32)

        def body(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_hi)
            def _():
                get_dma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            data = buf[slot]
            t_base = cb_ref[c]
            off = t_base - ptb8
            t_base8 = ptb8 + (off // 8) * 8
            (
                onehot,
                eq16,
                cx,
                cy,
                live_row,
                r_last,
                straddles,
                mask_sl,
            ) = _window_rides(
                data, ds_ref, dc_ref, t_base8, c, gx, td, live_ref[1]
            )
            a, live, *_ = _seg_alpha(data, Ub, cx, cy, live_row)
            one_m = 1.0 - a
            l = jnp.log1p(-a)
            # tri ∧ seg-equality stays 0/1 — exact in bf16
            tri_seg = tri_x * eq16
            cum_excl = _cumsum_seg(l, tri_seg)
            maskc, carried = _carried_mask(data, ds_ref, t_base, c, td)
            N_eff = jnp.where(maskc, carryN[:, 0:1], 1.0)
            N_excl = N_eff * jnp.exp(cum_excl)
            N_incl = N_excl * one_m
            contrib = N_incl >= T_STOP
            w = a * N_excl * contrib
            lg = jnp.where(contrib, l, 0.0)
            # per-tile color / gated-log-T partials — matmuls at natural M
            rgbT = data[_R : _B3 + 1, :]
            mrgb = (onehot[:, None, :] * rgbT[None, :, :]).reshape(
                3 * KS2, CHUNK
            )
            colorY = jax.lax.dot_general(
                mrgb,
                w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (3·KS2, PX)
            tY = _dot_ab_exact(
                onehot, lg, (((1,), (1,)), ((), ()))
            )  # (KS2, PX)
            stage_c[
                pl.ds(pl.multiple_of((off // 8) * 24, 8), 3 * KS2), :
            ] += colorY
            stage_t[
                pl.ds(pl.multiple_of((off // 8) * 8, 8), KS2), :
            ] += tY
            # column-form ungated-N carry for the straddler (color/log-T
            # partials cross program boundaries via the HBM re-read)
            lsum_st = jnp.sum(l * mask_sl, axis=1, keepdims=True)
            from_carry = carried & (t_base8 + r_last == t_base)
            n_in = jnp.where(from_carry, carryN[:, 0:1], 1.0)
            carryN[:] = jnp.where(
                straddles, n_in * jnp.exp(lsum_st), 1.0
            )
            return 0

        jax.lax.fori_loop(c0, n_hi, body, 0)

        # self-waited output DMAs (no cross-program DMA state); the
        # straddler's row holds a partial the next program re-reads
        dma_c = pltpu.make_async_copy(
            stage_c,
            out_c_ref.at[pl.ds(3 * ptb8, 3 * WS), :],
            osem.at[0],
        )
        dma_t = pltpu.make_async_copy(
            stage_t,
            out_t_ref.at[pl.ds(ptb8, WS), :],
            osem.at[1],
        )
        dma_c.start()
        dma_t.start()
        dma_c.wait()
        dma_t.wait()


def _bwd_seg_kernel(
    # scalar prefetch
    ds_ref,
    dc_ref,
    dt_ref,
    cb_ref,
    live_ref,
    # inputs
    inst_ref,  # (NROWS, R8) HBM
    cf_ref,  # (3·TDpad, PX) HBM — dense color_full rows
    dl_ref,  # (3·TDpad, PX) HBM — dense dL rows
    zeros_ref,  # (NROWS, R8) HBM — aliased to dinst_ref
    # outputs
    dinst_ref,  # (NROWS, R8) HBM
    # scratch
    buf,  # (2, NROWS, CHUNK)
    gbuf,  # (2, NROWS, CHUNK)
    wcf,  # (3, WS, PX) VMEM window, channel-major blocks
    wdl,  # (3, WS, PX) VMEM window, channel-major blocks
    carryN,  # (PX, 1)
    carryP,  # (PX, 1) — dL_dot_prefix carry
    sems,  # DMA(2)
    out_sem,  # DMA(2)
    wsem,  # DMA(6)
    *,
    gx: int,
    td: int,
    td_pad: int,
):
    p = pl.program_id(0)
    live_chunks = live_ref[0]
    c0 = p * CPB
    self_live = c0 < live_chunks
    Ub = _u_basis().astype(jnp.bfloat16)
    Ut = _ut_basis()
    tri_x = _tri(True)
    tri_i = _tri(False)

    @pl.when(p == 0)
    def _():
        carryN[:] = jnp.ones((PX, 1), jnp.float32)
        carryP[:] = jnp.zeros((PX, 1), jnp.float32)

    @pl.when(self_live)
    def _():
        ptb = cb_ref[c0]
        ptb8 = pl.multiple_of((ptb // 8) * 8, 8)
        n_hi = jnp.minimum(live_chunks, c0 + CPB)
        # blocking window fetches (program-local, self-contained DMA
        # state): one DMA per channel block of each array
        wdmas = []
        for ch in range(3):
            src = pl.multiple_of(ch * td_pad + ptb8, 8)
            wdmas.append(
                pltpu.make_async_copy(
                    cf_ref.at[pl.ds(src, WS), :], wcf.at[ch], wsem.at[ch]
                )
            )
            wdmas.append(
                pltpu.make_async_copy(
                    dl_ref.at[pl.ds(src, WS), :], wdl.at[ch],
                    wsem.at[3 + ch],
                )
            )
        for d in wdmas:
            d.start()

        def get_dma(slot, c):
            off = pl.multiple_of(c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, CHUNK)], buf.at[slot], sems.at[slot]
            )

        def out_dma(c):
            off = pl.multiple_of(c * CHUNK, CHUNK)
            return pltpu.make_async_copy(
                gbuf.at[jax.lax.rem(c, 2)],
                dinst_ref.at[:, pl.ds(off, CHUNK)],
                out_sem.at[jax.lax.rem(c, 2)],
            )

        get_dma(jax.lax.rem(c0, 2), c0).start()
        for d in wdmas:
            d.wait()

        def body(c, _):
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_hi)
            def _():
                get_dma(1 - slot, c + 1).start()

            get_dma(slot, c).wait()
            data = buf[slot]
            t_base = cb_ref[c]
            off = t_base - ptb8
            t_base8 = ptb8 + (off // 8) * 8
            (
                onehot,
                eq16,
                cx,
                cy,
                live_row,
                r_last,
                straddles,
                mask_sl,
            ) = _window_rides(
                data, ds_ref, dc_ref, t_base8, c, gx, td, live_ref[1]
            )
            w_off = pl.multiple_of((off // 8) * 8, 8)
            cf3 = [wcf[ch, pl.ds(w_off, KS2), :] for ch in range(3)]
            dl3 = [wdl[ch, pl.ds(w_off, KS2), :] for ch in range(3)]
            a, live, opG, xg, yg, A, B, C, op = _seg_alpha(
                data, Ub, cx, cy, live_row
            )
            one_m = 1.0 - a
            l = jnp.log1p(-a)
            tri_seg_x = tri_x * eq16
            tri_seg_i = tri_i * eq16
            cum_excl = _cumsum_seg(l, tri_seg_x)
            maskc, carried = _carried_mask(data, ds_ref, t_base, c, td)
            N_eff = jnp.where(maskc, carryN[:, 0:1], 1.0)
            N_excl = N_eff * jnp.exp(cum_excl)
            N_incl = N_excl * one_m
            contrib = N_incl >= T_STOP
            gate = live & contrib
            w = a * N_excl * contrib

            # Per-lane broadcasts of each tile's per-pixel rows via ONE
            # K=KS2 one-hot contraction per quantity (MXU pass time scales
            # with K; the K=3·KS2 masked-rgb contraction measured ~2×
            # dearer). Stack [dL_ch0; dL_ch1; dL_ch2; Σ_ch dL·C_full].
            rgbT = data[_R : _B3 + 1, :]
            Ccat = (
                dl3[0] * cf3[0] + dl3[1] * cf3[1] + dl3[2] * cf3[2]
            )  # (KS2, PX)
            stacked = jnp.concatenate(
                [dl3[0], dl3[1], dl3[2], Ccat], axis=0
            )  # (4·KS2, PX)
            # 4 independent K=KS2 broadcasts (block-diagonal contraction)
            bc = [
                _dot_ba_exact(
                    stacked[i * KS2 : (i + 1) * KS2],
                    onehot,
                    (((0,), (0,)), ((), ())),
                )
                for i in range(4)
            ]  # 4 × (PX, CHUNK)
            u = (
                bc[0] * rgbT[0:1, :]
                + bc[1] * rgbT[1:2, :]
                + bc[2] * rgbT[2:3, :]
            )
            wu = w * u
            dl_wc_cum = _cumsum_seg(wu, tri_seg_i)
            dCf_lane = bc[3]  # (PX, CHUNK)
            pfx_lane = jnp.where(maskc, carryP[:, 0:1], 0.0)
            dL_dot_B = dCf_lane - pfx_lane - dl_wc_cum
            dL_da = jnp.where(gate, N_excl * u - dL_dot_B / one_m, 0.0)

            # V-moment MXU backward (the pixel basis is tile-local per
            # lane already). Ut's entries are half-integer products — EXACT
            # in bf16 — so the 3-split runs at half the passes of HIGHEST.
            V = dL_da * opG
            S = _dot_ab_exact(Ut, V, (((1,), (0,)), ((), ())))
            S0, S1, S2 = S[0:1, :], S[1:2, :], S[2:3, :]
            S3, S4, S5 = S[3:4, :], S[4:5, :], S[5:6, :]
            sVdx = xg * S0 - S1
            sVdy = yg * S0 - S2
            sVdxdx = xg * xg * S0 - 2.0 * xg * S1 + S3
            sVdxdy = xg * yg * S0 - xg * S2 - yg * S1 + S4
            sVdydy = yg * yg * S0 - 2.0 * yg * S2 + S5
            inv_op = jnp.where(op > 0.0, 1.0 / op, 0.0)
            # per-instance color grads: with the per-lane dL broadcasts in
            # hand these are plain sublane reductions — no K=PX matmul
            dr = jnp.sum(bc[0] * w, axis=0, keepdims=True)
            dg = jnp.sum(bc[1] * w, axis=0, keepdims=True)
            db = jnp.sum(bc[2] * w, axis=0, keepdims=True)
            zero_row = jnp.zeros((1, CHUNK), jnp.float32)
            rows = [
                -(A * sVdx + B * sVdy),
                -(C * sVdy + B * sVdx),
                -0.5 * sVdxdx,
                -sVdxdy,
                -0.5 * sVdydy,
                S0 * inv_op,
                dr,
                dg,
                db,
            ]
            rows += [zero_row] * (NROWS - len(rows))
            gdata = jnp.concatenate(rows, axis=0)

            # chunk write-back: every chunk is written exactly once
            @pl.when(c - 2 >= c0)
            def _():
                out_dma(c - 2).wait()

            gbuf[jax.lax.rem(c, 2)] = gdata
            out_dma(c).start()

            # carries
            lsum_st = jnp.sum(l * mask_sl, axis=1, keepdims=True)
            wusum_st = jnp.sum(wu * mask_sl, axis=1, keepdims=True)
            from_c = carried & (t_base8 + r_last == t_base)
            n_in = jnp.where(from_c, carryN[:, 0:1], 1.0)
            p_in = jnp.where(from_c, carryP[:, 0:1], 0.0)
            carryN[:] = jnp.where(straddles, n_in * jnp.exp(lsum_st), 1.0)
            carryP[:] = jnp.where(straddles, p_in + wusum_st, 0.0)
            return 0

        jax.lax.fori_loop(c0, n_hi, body, 0)

        # drain the last two write-backs
        @pl.when(n_hi - 2 >= c0)
        def _():
            out_dma(n_hi - 2).wait()

        @pl.when(n_hi - 1 >= c0)
        def _():
            out_dma(n_hi - 1).wait()


def _seg_aux(starts8, counts, live8, r8: int, num_tiles: int, tile_lo=0):
    """Dense-tile enumeration + per-chunk window bases (host-side XLA)."""
    td = num_tiles + 1
    nonempty = counts > 0
    pos = jnp.cumsum(nonempty.astype(jnp.int32)) - 1
    tgt = jnp.where(nonempty, pos, td)  # empties dropped by mode="drop"
    dense_start = (
        jnp.full((td,), r8, jnp.int32).at[tgt].set(starts8, mode="drop")
    )
    dense_count = (
        jnp.zeros((td,), jnp.int32).at[tgt].set(counts, mode="drop")
    )
    dense_tid = (
        jnp.zeros((td,), jnp.int32)
        .at[tgt]
        .set(jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    )
    n_chunks = r8 // CHUNK
    cb = (
        jnp.searchsorted(
            dense_start,
            jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK,
            side="right",
        ).astype(jnp.int32)
        - 1
    )
    cb = jnp.clip(cb, 0, td - 1)
    live_chunks = jnp.stack(
        [
            (live8 + CHUNK - 1) // CHUNK,
            jnp.asarray(tile_lo),
        ]
    ).astype(jnp.int32)
    return dense_start, dense_count, dense_tid, cb, live_chunks, pos, nonempty


def _build_inst_seg(
    means2d, conic, rgb, opacity, sorted_g8, live8, perm, ride_d, ride_t
):
    """(NROWS, R8) slab build with a zero sentinel row (pad/dead lanes
    carry ``sorted_g8 == P`` and gather an all-zero instance → α = 0 ⇒
    dead) plus the per-lane window ride rows (_SEG_ROW/_TID_ROW)."""
    p = opacity.shape[0]
    packed = jnp.concatenate(
        [
            means2d,
            conic,
            opacity[:, None],
            rgb,
            jnp.zeros((p, NROWS - 9), means2d.dtype),
        ],
        axis=-1,
    )
    if perm is not None:
        packed = packed[perm]
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, NROWS), packed.dtype)]
    )  # sentinel row P
    idx = jnp.minimum(sorted_g8, p)
    r8 = sorted_g8.shape[0]

    def _with_rides(rows, rd, rt):
        # splice the per-slot ride rows into the gathered block (a value
        # concat that fuses with the gather — a post-hoc
        # dynamic_update_slice on the full slab costs a whole extra copy)
        return jnp.concatenate(
            [
                rows[:_SEG_ROW],
                rd.astype(jnp.float32)[None, :],
                rt.astype(jnp.float32)[None, :],
                rows[_TID_ROW + 1 :],
            ],
            axis=0,
        )

    CH = 1 << 16
    if r8 % CH != 0 or r8 // CH <= 24:
        return _with_rides(packed[idx].T, ride_d, ride_t)
    n_chunks = jnp.minimum((live8 + CH - 1) // CH, r8 // CH)

    def _body(carry):
        out, i = carry
        off = i * CH
        g_c = jax.lax.dynamic_slice(idx, (off,), (CH,))
        rd_c = jax.lax.dynamic_slice(ride_d, (off,), (CH,))
        rt_c = jax.lax.dynamic_slice(ride_t, (off,), (CH,))
        rows_c = _with_rides(packed[g_c].T, rd_c, rt_c)
        return (
            jax.lax.dynamic_update_slice(out, rows_c, (0, off)),
            i + 1,
        )

    out, _ = jax.lax.while_loop(
        lambda c: c[1] < n_chunks,
        _body,
        (jnp.zeros((NROWS, r8), packed.dtype), jnp.int32(0)),
    )
    return out


def composite_seg_fwd(
    inst_T8, starts8, counts, live8, num_tiles: int, gx: int,
    interpret: bool = False, tile_lo=0,
):
    """Run the segmented forward → (color (T,3,PX), finalT (T,PX))."""
    r8 = inst_T8.shape[1]
    td = num_tiles + 1
    td_pad = td + WS
    ds, dc, dt, cb, live_chunks, pos, nonempty = _seg_aux(
        starts8, counts, live8, r8, num_tiles, tile_lo
    )
    n_chunks = r8 // CHUNK
    n_prog = -(-n_chunks // CPB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.VMEM((3 * WS, PX), jnp.float32),
            pltpu.VMEM((WS, PX), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_c, out_t = pl.pallas_call(
        functools.partial(_fwd_seg_kernel, gx=gx, td=td),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3 * td_pad, PX), jnp.float32),
            jax.ShapeDtypeStruct((td_pad, PX), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ds, dc, dt, cb, live_chunks, inst_T8)
    # dense rows → tile-major, defaults for empty tiles
    base = jnp.clip(pos, 0, td_pad - 1)
    idx3 = (3 * base[:, None] + jnp.arange(3)[None, :]).reshape(-1)
    color = out_c[idx3].reshape(num_tiles, 3, PX)
    color = jnp.where(nonempty[:, None, None], color, 0.0)
    finalT = jnp.exp(out_t[base])
    finalT = jnp.where(nonempty[:, None], finalT, 1.0)
    return color, finalT


def _dense_rows_from_tiles(tiles3, dense_tid, td_pad: int):
    """(T, 3, PX) tile-major → (3·TDpad, PX) dense rows, CHANNEL-MAJOR
    blocks (rows [ch·TDpad + d]) so the kernel's per-channel window
    slices are contiguous."""
    t = tiles3.shape[0]
    flat = jnp.swapaxes(tiles3, 0, 1).reshape(3 * t, PX)
    idx = (
        jnp.arange(3)[:, None] * t + jnp.clip(dense_tid, 0, t - 1)[None, :]
    ).reshape(-1)
    rows = flat[idx].reshape(3, -1, PX)
    rows = jnp.pad(rows, ((0, 0), (0, td_pad - rows.shape[1]), (0, 0)))
    return rows.reshape(3 * td_pad, PX)


def composite_seg_bwd(
    inst_T8, starts8, counts, live8, color_full, dcolor,
    num_tiles: int, gx: int, interpret: bool = False, tile_lo=0,
):
    """Segmented backward → (NROWS, R8) per-instance gradient rows."""
    r8 = inst_T8.shape[1]
    td = num_tiles + 1
    td_pad = -(-(td + WS) // 8) * 8  # channel-block offsets stay 8-aligned
    ds, dc, dt, cb, live_chunks, pos, nonempty = _seg_aux(
        starts8, counts, live8, r8, num_tiles, tile_lo
    )
    cf_d = _dense_rows_from_tiles(color_full, dt, td_pad)
    dl_d = _dense_rows_from_tiles(dcolor, dt, td_pad)
    n_chunks = r8 // CHUNK
    n_prog = -(-n_chunks // CPB)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, NROWS, CHUNK), jnp.float32),
            pltpu.VMEM((3, WS, PX), jnp.float32),
            pltpu.VMEM((3, WS, PX), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.VMEM((PX, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    zeros = jnp.zeros_like(inst_T8)
    (dinst,) = pl.pallas_call(
        functools.partial(_bwd_seg_kernel, gx=gx, td=td, td_pad=td_pad),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(inst_T8.shape, jnp.float32)],
        input_output_aliases={8: 0},  # zeros (after 5 prefetch + 3 inputs)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ds, dc, dt, cb, live_chunks, inst_T8, cf_d, dl_d, zeros)
    return dinst


# ---------------------------------------------------------------------------
# Differentiable wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19))
def composite_instances_seg(
    means2d,
    conic,
    rgb,
    opacity,
    bg,
    sorted_g8,
    starts8,
    counts,
    live8,
    ride_d,
    ride_t,
    e8,
    seg_lo,
    seg_hi,
    perm,
    inv_perm,
    tile_lo,
    num_tiles,
    gx,
    interpret,
):
    """Segmented-chunk compositing of an 8-granular slab
    (`binning.segment_relay`). Same contracts as
    `pallas_raster.composite_instances` with ``want_ncontrib=False``
    (n_contrib returns zeros); the gradient reduction reuses the existing
    gather (``e8``/``seg_lo``/``seg_hi``) and live-bound scatter paths.
    """
    inst_T8 = _build_inst_seg(
        means2d, conic, rgb, opacity, sorted_g8, live8, perm, ride_d,
        ride_t,
    )
    color, finalT = composite_seg_fwd(
        inst_T8, starts8, counts, live8, num_tiles, gx, interpret, tile_lo
    )
    color = color + finalT[:, None, :] * bg[None, :, None]
    ncontrib = jnp.zeros((num_tiles, PX), jnp.int32)
    return color, finalT, ncontrib


def _ci_seg_fwd(
    means2d, conic, rgb, opacity, bg, sorted_g8, starts8, counts, live8,
    ride_d, ride_t, e8, seg_lo, seg_hi, perm, inv_perm, tile_lo,
    num_tiles, gx, interpret,
):
    inst_T8 = _build_inst_seg(
        means2d, conic, rgb, opacity, sorted_g8, live8, perm, ride_d,
        ride_t,
    )
    color, finalT = composite_seg_fwd(
        inst_T8, starts8, counts, live8, num_tiles, gx, interpret, tile_lo
    )
    color_full = color + finalT[:, None, :] * bg[None, :, None]
    ncontrib = jnp.zeros((num_tiles, PX), jnp.int32)
    res = (
        inst_T8,
        sorted_g8,
        starts8,
        counts,
        live8,
        tile_lo,
        ride_d,
        ride_t,
        e8,
        seg_lo,
        seg_hi,
        perm,
        inv_perm,
        color_full,
        bg,
        means2d.shape[0],
    )
    return (color_full, finalT, ncontrib), res


def _ci_seg_bwd(num_tiles, gx, interpret, res, cts):
    (
        inst_T8,
        sorted_g8,
        starts8,
        counts,
        live8,
        tile_lo,
        ride_d,
        ride_t,
        e8,
        seg_lo,
        seg_hi,
        perm,
        inv_perm,
        color_full,
        bg,
        P,
    ) = res
    dcolor = cts[0]
    dinst = composite_seg_bwd(
        inst_T8, starts8, counts, live8, color_full, dcolor,
        num_tiles, gx, interpret, tile_lo,
    )
    r8 = sorted_g8.shape[0]
    rows = dinst[:9, :].T  # (R8, 9)
    if e8 is not None:
        acc = gather_reduce_rows(rows, e8, seg_lo, seg_hi)
    else:
        # live-bound chunked scatter (pad lanes carry the P sentinel and
        # drop; rows past live8 are donated zeros)
        CH_R = 1 << 16
        r_pad = -(-r8 // CH_R) * CH_R
        ids_p = jnp.concatenate(
            [sorted_g8, jnp.full((r_pad - r8,), P, jnp.int32)]
        )
        rows_p = jnp.concatenate(
            [rows, jnp.zeros((r_pad - r8, 9), rows.dtype)]
        )
        n_chunks = jnp.minimum((live8 + CH_R - 1) // CH_R, r_pad // CH_R)

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
    if inv_perm is not None:
        acc = acc[inv_perm]
    dm2d = acc[:, 0:2]
    dcon = acc[:, 2:5]
    dop = acc[:, 5]
    drgb = acc[:, 6:9]
    return (
        dm2d,
        dcon,
        drgb,
        dop,
        jnp.zeros_like(bg),
        _int_ct(sorted_g8),
        _int_ct(starts8),
        _int_ct(counts),
        _int_ct(live8),
        _int_ct(ride_d),
        _int_ct(ride_t),
        None if e8 is None else _int_ct(e8),
        None if seg_lo is None else _int_ct(seg_lo),
        None if seg_hi is None else _int_ct(seg_hi),
        None if perm is None else _int_ct(perm),
        None if inv_perm is None else _int_ct(inv_perm),
        _int_ct(tile_lo),
    )


composite_instances_seg.defvjp(_ci_seg_fwd, _ci_seg_bwd)
