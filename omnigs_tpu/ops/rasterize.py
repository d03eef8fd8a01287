"""M1: tile-binned differentiable rasterizer in pure XLA with custom VJP.

The TPU-native re-design of the reference rasterization core
(`/root/reference/cuda_rasterizer/rasterizer_impl.cu:540-787`,
`forward.cu:346-467`, `backward.cu:672-843`):

* Compositing is **dense per-tile math**: each 16×16 tile holds 256 pixels; a
  chunk of its depth-sorted instances is evaluated for all pixels at once and
  the color accumulation `w @ colors` is a matmul on the MXU. The CUDA
  per-pixel `done` flag / shared-memory staging has no analog here — early
  termination is closed-form (see below), whole-tile skipping is the Pallas
  kernel's job.
* The backward produces per-(tile, instance) gradients with tile-level
  reductions and scatter-adds them per Gaussian — deterministic, unlike the
  reference's `atomicAdd` scatter (`backward.cu:805-840`).
* The early-termination rule (stop once transmittance would fall below 1e-4,
  `forward.cu:436-444`) is expressed with the *naive* running product N of
  (1-α): an instance contributes iff its inclusive product N·Π(1-α) ≥ 1e-4.
  Because factors are ≤ 1, the first crossing permanently disables all later
  instances — exactly the reference's `done` flag.
* Quirk parity: like the reference backward (`backward.cu:780,821`), the
  α = min(0.99, ·) clamp is ignored in the backward (dG = opacity·dL_dα
  unconditionally); the +0.3 low-pass and SH/clip clamp rules come out of JAX
  autodiff identically to the hand-written CUDA rules.

Outputs `final_T` / `n_contrib` are diagnostics (residual state in the
reference, `rasterizer_impl.cu:418-433`) and are non-differentiable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.cameras import Camera
from omnigs_tpu.ops.binning import BinnedTiles, bin_gaussians
from omnigs_tpu.ops.preprocess import TILE, Preprocessed, preprocess, tile_grid

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_STOP = 1.0e-4

# gather_reduce crossover: its rank-inversion sort runs over the full
# static instance cap (cannot be live-bound), the scatter fallback is
# live-bound — above ~2M cap the sort tax exceeds the scatter savings
# (measured: gather wins +3 Mpix/s at the 1.2M bench cap, loses ~40 ms/it
# at the 2^22 protocol cap; BENCH.md round 4)
GATHER_REDUCE_MAX_R = 1 << 21


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static capacity knobs (all shapes derive from these — no host syncs)."""

    max_instances: int = 1 << 20  # instance buffer capacity R
    tile_cap: int = 1024  # max composited instances per tile (XLA backend)
    chunk: int = 32  # instances composited per scan step (XLA backend)
    backend: str = "xla"  # "xla" | "pallas"
    interpret: bool = False  # Pallas interpreter mode (CPU tests)
    # opacity-aware tight rects: output-identical, fewer instances; changes
    # only n_contrib ranks / radii stats vs the reference's fixed 3σ
    tight_culling: bool = False
    # exact per-(gaussian, tile) ellipse–box culling in binning (Pallas
    # backend only): image/final_T-identical, n_contrib ranks shift
    tile_culling: bool = False
    # static bound on the *live* slab (sum of per-tile counts — chunk-padded
    # in the ghost_align layout, exact in the compact one). The slab build
    # gather and the backward instance→Gaussian scatter-add scale linearly
    # with this; the default (full sorted-array length) never drops
    # anything. Tiles whose segment would cross the cap are dropped
    # deterministically and counted in `truncated`.
    aligned_cap: int | None = None
    # ghost-aligned slab layout (pad every tile's run to a chunk multiple
    # with ghost instances inside the sort). Default False = compact layout:
    # tight per-tile segments, kernels mask the unaligned head lanes —
    # ~tiles·chunk fewer rows through the sort/gather/scatter stages.
    ghost_align: bool = False
    # n_contrib contribution-rank output (diagnostic; nothing in the
    # training/eval path consumes it — our backward recomputes
    # transmittances rather than seeding from it like the reference,
    # `backward.cu:700-712`). False skips ~10 VPU ops per pixel-instance
    # pair in the Pallas forward and returns zeros.
    want_ncontrib: bool = True
    # fuse the instance→Gaussian gradient reduction into the Pallas
    # backward kernel (VMEM-resident per-Gaussian accumulator, no HBM grad
    # slab / serial scatter-add). Applies when P ≤ FUSED_REDUCE_MAX_P
    # (accumulator must fit VMEM) and the segment-diff path is off;
    # otherwise falls back to the unfused backward automatically.
    fused_reduce: bool = False
    # gather-based instance→Gaussian gradient reduction: binning carries a
    # survivor-rank payload through the sort; the backward inverts it with
    # one cheap 1-key sort, GATHERS gradient rows into rank order (~4×
    # cheaper than the serial scatter-add) and reduces per Gaussian by
    # cumsum + segment diff. Grads match the scatter path to ~1e-5 relative
    # (f32 cumsum), not bitwise.
    gather_reduce: bool = False
    # depth-presort packed-key binning (`bin_instances_packed`): sort the P
    # Gaussians by depth once, then the per-instance sort needs only ONE
    # packed uint32 key (tile<<19 | depth_rank, unique ⇒ unstable) —
    # roughly half the main-sort traffic. Output-identical to the stable
    # (tile, depth) sort. Auto-falls-back to `bin_instances` when P > 2^19
    # or num_tiles ≥ 2^13−1, or with ghost_align.
    depth_presort: bool = False
    # segmented-chunk kernels (ops/pallas_seg.py): re-lay the slab to
    # 8-granular per-tile segments and walk it linearly — one kernel pass
    # per 128-lane chunk, straddling tile boundaries, instead of a chunk
    # walk per tile. Kills the ~47% masked chunk-lanes of the tile-major
    # kernels at low instances/tile (BENCH.md r4 tile-size analysis) for
    # an O(R) re-lay. Pixel outputs match to f32 summation-order noise
    # (chunk grouping differs), not bitwise. Requires the Pallas backend;
    # n_contrib is not computed (want_ncontrib must be False).
    segmented: bool = False

    def __post_init__(self):
        assert self.tile_cap % self.chunk == 0
        assert self.backend in ("xla", "pallas")
        if self.segmented:
            assert self.backend == "pallas", "segmented needs Pallas"
            assert not self.want_ncontrib, (
                "segmented kernels do not compute n_contrib"
            )
            assert not self.ghost_align and not self.fused_reduce, (
                "segmented replaces the ghost/fused layouts"
            )
        if self.aligned_cap is not None and self.backend == "pallas":
            from omnigs_tpu.ops.pallas_raster import CHUNK

            # the Pallas backward DMAs whole CHUNK-wide slices; a ragged
            # cap renders fine forward-only but trace-crashes training
            assert self.aligned_cap % CHUNK == 0, (
                f"aligned_cap must be a multiple of {CHUNK}, "
                f"got {self.aligned_cap}"
            )


class RenderResult(NamedTuple):
    image: jnp.ndarray  # (3, H, W) — channels-first (reference torch CHW)
    radii: jnp.ndarray  # (P,) float; 0 ⇒ culled (visibility filter)
    final_T: jnp.ndarray  # (H, W) transmittance (non-diff)
    n_contrib: jnp.ndarray  # (H, W) int32 (non-diff)
    overflow: jnp.ndarray  # () int32 instances dropped by tile_cap
    truncated: jnp.ndarray  # () int32 instances dropped by max_instances


def _tile_pixel_coords(grid_x: int, grid_y: int) -> jnp.ndarray:
    """(num_tiles, TILE², 2) float pixel centers, tiles row-major."""
    t = np.arange(grid_x * grid_y)
    tx, ty = t % grid_x, t // grid_x
    p = np.arange(TILE * TILE)
    px, py = p % TILE, p // TILE
    x = tx[:, None] * TILE + px[None, :]
    y = ty[:, None] * TILE + py[None, :]
    return jnp.asarray(np.stack([x, y], axis=-1), dtype=jnp.float32)


def tile_window_pixel_coords(tile_lo, n_tiles: int, grid_x: int) -> jnp.ndarray:
    """Pixel coords for a (possibly traced) tile window — the sharded-tile
    analog of `_tile_pixel_coords` used by parallel/shard.py."""
    t = tile_lo + jnp.arange(n_tiles, dtype=jnp.int32)
    tx, ty = t % grid_x, t // grid_x
    p = jnp.arange(TILE * TILE, dtype=jnp.int32)
    px, py = p % TILE, p // TILE
    x = tx[:, None] * TILE + px[None, :]
    y = ty[:, None] * TILE + py[None, :]
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def _chunk_geometry(ids, msk, means2d, conic, opacity, pix):
    """Shared fwd/bwd per-chunk math. Returns per-(tile,pixel,instance) α etc."""
    xy = means2d[ids]  # (T, KC, 2)
    con = conic[ids]  # (T, KC, 3)
    op = opacity[ids]  # (T, KC)
    d = xy[:, None, :, :] - pix[:, :, None, :]  # (T, PX, KC, 2)
    dx, dy = d[..., 0], d[..., 1]
    power = (
        -0.5 * (con[:, None, :, 0] * dx * dx + con[:, None, :, 2] * dy * dy)
        - con[:, None, :, 1] * dx * dy
    )
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_MAX, op[:, None, :] * G)
    live = msk[:, None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(live, alpha, 0.0)
    return a, live, G, dx, dy, con, op


def _composite_tiles_fwd_impl(
    means2d, conic, rgb, opacity, bg, tile_ids, tile_mask, pix, chunk
):
    """Forward compositing. Returns (color (T,PX,3), final_T, n_contrib)."""
    T_tiles, cap = tile_ids.shape
    n_chunks = cap // chunk
    ids_x = tile_ids.reshape(T_tiles, n_chunks, chunk).transpose(1, 0, 2)
    msk_x = tile_mask.reshape(T_tiles, n_chunks, chunk).transpose(1, 0, 2)
    PX = pix.shape[1]

    def step(carry, xs):
        N, T_stop, color, n_contrib, kbase = carry
        ids, msk = xs
        a, live, _, _, _, _, _ = _chunk_geometry(
            ids, msk, means2d, conic, opacity, pix
        )
        col = rgb[ids]  # (T, KC, 3)
        one_m = 1.0 - a
        cp = jnp.cumprod(one_m, axis=-1)
        N_incl = N[..., None] * cp
        N_excl = N_incl / one_m
        contrib = N_incl >= T_STOP
        w = a * N_excl * contrib
        color = color + jnp.einsum(
            "tpk,tkc->tpc", w, col, precision=jax.lax.Precision.HIGHEST
        )
        T_stop = T_stop * jnp.prod(jnp.where(contrib, one_m, 1.0), axis=-1)
        N = N_incl[..., -1]
        rank = kbase + jnp.arange(1, chunk + 1, dtype=jnp.int32)
        n_contrib = jnp.maximum(
            n_contrib,
            jnp.max(
                jnp.where(live & contrib, rank[None, None, :], 0), axis=-1
            ),
        )
        return (N, T_stop, color, n_contrib, kbase + chunk), None

    init = (
        jnp.ones((T_tiles, PX)),
        jnp.ones((T_tiles, PX)),
        jnp.zeros((T_tiles, PX, 3)),
        jnp.zeros((T_tiles, PX), dtype=jnp.int32),
        jnp.int32(0),
    )
    (N, T_stop, color, n_contrib, _), _ = jax.lax.scan(
        step, init, (ids_x, msk_x)
    )
    color = color + T_stop[..., None] * bg[None, None, :]
    return color, T_stop, n_contrib


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _composite_tiles(means2d, conic, rgb, opacity, bg, tile_ids, tile_mask, pix, chunk):
    return _composite_tiles_fwd_impl(
        means2d, conic, rgb, opacity, bg, tile_ids, tile_mask, pix, chunk
    )


def _composite_fwd(means2d, conic, rgb, opacity, bg, tile_ids, tile_mask, pix, chunk):
    out = _composite_tiles_fwd_impl(
        means2d, conic, rgb, opacity, bg, tile_ids, tile_mask, pix, chunk
    )
    color, _, _ = out
    res = (means2d, conic, rgb, opacity, bg, tile_ids, tile_mask, pix, color)
    return out, res


def _composite_bwd(chunk, res, cts):
    means2d, conic, rgb, opacity, bg, tile_ids, tile_mask, pix, color_full = res
    dL_dcolor = cts[0]  # (T, PX, 3); final_T / n_contrib are non-diff
    P = means2d.shape[0]
    T_tiles, cap = tile_ids.shape
    n_chunks = cap // chunk
    ids_x = tile_ids.reshape(T_tiles, n_chunks, chunk).transpose(1, 0, 2)
    msk_x = tile_mask.reshape(T_tiles, n_chunks, chunk).transpose(1, 0, 2)
    PX = pix.shape[1]

    def step(carry, xs):
        N, prefix, g_m2d, g_con, g_rgb, g_op = carry
        ids, msk = xs
        a, live, G, dx, dy, con, op = _chunk_geometry(
            ids, msk, means2d, conic, opacity, pix
        )
        col = rgb[ids]
        one_m = 1.0 - a
        cp = jnp.cumprod(one_m, axis=-1)
        N_incl = N[..., None] * cp
        N_excl = N_incl / one_m
        contrib = N_incl >= T_STOP
        gate = live & contrib
        w = a * N_excl * contrib

        # w_j·c_j accumulated colors: inclusive in-chunk prefix (T,PX,KC,3)
        wc = w[..., None] * col[:, None, :, :]
        wc_prefix = jnp.cumsum(wc, axis=2)
        B = color_full[:, :, None, :] - (prefix[:, :, None, :] + wc_prefix)

        # dL/dα_i = Σ_ch dL_dC·(N_excl·c_i − B_i/(1−α_i))   [backward.cu:791-817]
        term1 = N_excl * jnp.einsum(
            "tkc,tpc->tpk", col, dL_dcolor, precision=jax.lax.Precision.HIGHEST
        )
        term2 = jnp.einsum(
            "tpkc,tpc->tpk", B, dL_dcolor, precision=jax.lax.Precision.HIGHEST
        ) / one_m
        dL_da = jnp.where(gate, term1 - term2, 0.0)

        # Quirk parity: ignore the 0.99 clamp (backward.cu:821).
        dL_dG = op[:, None, :] * dL_da
        dL_dop = jnp.sum(G * dL_da, axis=1)  # (T, KC)

        gdx = G * dx
        gdy = G * dy
        A, Bc, C = con[:, None, :, 0], con[:, None, :, 1], con[:, None, :, 2]
        dG_ddelx = -gdx * A - gdy * Bc
        dG_ddely = -gdy * C - gdx * Bc
        dL_dxy = jnp.stack(
            [
                jnp.sum(dL_dG * dG_ddelx, axis=1),
                jnp.sum(dL_dG * dG_ddely, axis=1),
            ],
            axis=-1,
        )  # (T, KC, 2)
        # true conic grads (the reference's 0.5/×2 dance nets out to these)
        dL_dcon = jnp.stack(
            [
                jnp.sum(-0.5 * gdx * dx * dL_dG, axis=1),
                jnp.sum(-gdx * dy * dL_dG, axis=1),
                jnp.sum(-0.5 * gdy * dy * dL_dG, axis=1),
            ],
            axis=-1,
        )  # (T, KC, 3)
        dL_drgb = jnp.einsum(
            "tpk,tpc->tkc", w, dL_dcolor, precision=jax.lax.Precision.HIGHEST
        )

        # deterministic per-Gaussian reduction (replaces atomicAdd scatter)
        sids = jnp.where(msk, ids, P).reshape(-1)
        g_m2d = g_m2d.at[sids].add(dL_dxy.reshape(-1, 2), mode="drop")
        g_con = g_con.at[sids].add(dL_dcon.reshape(-1, 3), mode="drop")
        g_rgb = g_rgb.at[sids].add(dL_drgb.reshape(-1, 3), mode="drop")
        g_op = g_op.at[sids].add(dL_dop.reshape(-1), mode="drop")

        prefix = prefix + jnp.sum(wc, axis=2)
        N = N_incl[..., -1]
        return (N, prefix, g_m2d, g_con, g_rgb, g_op), None

    init = (
        jnp.ones((T_tiles, PX)),
        jnp.zeros((T_tiles, PX, 3)),
        jnp.zeros((P + 1, 2)),
        jnp.zeros((P + 1, 3)),
        jnp.zeros((P + 1, 3)),
        jnp.zeros((P + 1,)),
    )
    (_, _, g_m2d, g_con, g_rgb, g_op), _ = jax.lax.scan(
        step, init, (ids_x, msk_x)
    )
    def int_ct(x):
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return (
        g_m2d[:P],
        g_con[:P],
        g_rgb[:P],
        g_op[:P],
        jnp.zeros_like(bg),
        int_ct(tile_ids),
        int_ct(tile_mask),
        jnp.zeros_like(pix),
    )


_composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def _tiles_to_image(tiles: jnp.ndarray, grid_x: int, grid_y: int, W: int, H: int):
    """(num_tiles, TILE²) → (H, W) or (num_tiles, C, TILE²) → (C, H, W) crop.

    Channels lead (CHW, the reference's torch convention) so the pixel axes
    stay minor — a channels-minor image lane-pads 3 → 128 on TPU and every
    op on it moves 42× the bytes."""
    if tiles.ndim == 3:
        c = tiles.shape[1]
        img = tiles.reshape(grid_y, grid_x, c, TILE, TILE)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            c, grid_y * TILE, grid_x * TILE
        )
        return img[:, :H, :W]
    img = tiles.reshape(grid_y, grid_x, TILE, TILE)
    img = img.transpose(0, 2, 1, 3).reshape(grid_y * TILE, grid_x * TILE)
    return img[:H, :W]


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    *,
    camera: Camera,
    viewmatrix: jnp.ndarray,
    campos: jnp.ndarray,
    bg: jnp.ndarray,
    sh_degree: int,
    config: RasterConfig = RasterConfig(),
    scale_modifier: float = 1.0,
    full_proj: Optional[jnp.ndarray] = None,
    means2d_ndc: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    cov3d_precomp: Optional[jnp.ndarray] = None,
    active_mask: Optional[jnp.ndarray] = None,
    features_override: Optional[jnp.ndarray] = None,
) -> RenderResult:
    """Differentiable render of one view. The JAX analog of
    `GaussianRasterizer::forward` (`src/gaussian_rasterizer.cpp:172-224`).

    Args:
      means2d_ndc: optional (P, 2) zeros whose gradient receives the
        NDC-convention screen-space gradients used for densification stats —
        the same trick as the reference's zero `means2D` input
        (`src/gaussian_renderer.cpp:47-52`).
      features_override: optional (P,) or (P, 3) per-Gaussian features to
        composite instead of RGB (depth rendering, `forward.cu:472-590`).
    """
    W, H = camera.width, camera.height
    gx, gy = tile_grid(camera)
    prep = preprocess(
        means3d,
        scales,
        quats,
        opacities,
        shs,
        camera,
        viewmatrix,
        campos,
        sh_degree,
        scale_modifier,
        full_proj=full_proj,
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
        active_mask=active_mask,
        tight_culling=config.tight_culling,
    )
    means2d = prep.means2d
    if means2d_ndc is not None:
        means2d = means2d + means2d_ndc * jnp.array([W * 0.5, H * 0.5])

    prep_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, prep)

    rgb = prep.rgb
    if features_override is not None:
        f = features_override
        if f.ndim == 1:
            f = jnp.tile(f[:, None], (1, 3))
        rgb = f

    if config.backend == "pallas":
        from omnigs_tpu.ops.binning import (
            RANK_BITS,
            bin_instances,
            bin_instances_aligned,
            bin_instances_packed,
        )
        from omnigs_tpu.ops.pallas_raster import CHUNK as PCHUNK
        from omnigs_tpu.ops.pallas_raster import composite_instances

        # The gather reduction's rank-inversion sort runs over the FULL
        # static cap (sorted_e cannot be live-bound), while the scatter
        # fallback is live-bound — so at generous caps (protocol configs
        # autosize to survive densify peaks; live ≪ cap) gather LOSES:
        # measured 140 vs 100 ms/it at the 2^22-cap protocol while
        # winning +3 Mpix/s at the retuned 1.2M bench cap. Demote
        # automatically above the measured crossover.
        gather_reduce = (
            config.gather_reduce
            and config.max_instances <= GATHER_REDUCE_MAX_R
            # measured loser under the segmented kernels: the emission
            # payload + relay e8 gather exceed the live-bound scatter's
            # cost on the 8-granular slab (BENCH.md r5: 25.3 vs 27.2)
            and not config.segmented
        )
        packable = (
            config.depth_presort
            and not config.ghost_align
            and means3d.shape[0] <= (1 << RANK_BITS)
            and gx * gy < (1 << (32 - RANK_BITS)) - 1
        )
        if packable:
            # depth-presorted single-packed-key binning (half the sort
            # traffic; sorted_g holds depth ranks, mapped via perm)
            inst = bin_instances_packed(
                prep_sg, gx, gy, config.max_instances,
                tile_cull=config.tile_culling,
                with_emission=gather_reduce,
            )
        elif config.ghost_align:
            # one-pass binning straight into chunk-aligned slabs via ghost
            # padding instances inside the sort
            inst = bin_instances_aligned(
                prep_sg, gx, gy, config.max_instances, PCHUNK,
                tile_cull=config.tile_culling,
                with_emission=gather_reduce,
            )
        else:
            # compact layout: tight segments, kernels mask unaligned heads
            inst = bin_instances(
                prep_sg, gx, gy, config.max_instances,
                tile_cull=config.tile_culling,
                with_emission=gather_reduce,
            )
        truncated = inst.truncated
        sorted_g, sorted_e = inst.sorted_g, inst.sorted_e
        starts, counts = inst.starts, inst.counts
        if config.segmented:
            from omnigs_tpu.ops.binning import segment_relay
            from omnigs_tpu.ops.pallas_seg import composite_instances_seg

            p_gauss = means3d.shape[0]
            r8 = config.aligned_cap
            if r8 is None:
                r8 = -(-config.max_instances // PCHUNK) * PCHUNK
            seg = segment_relay(
                sorted_g, sorted_e, starts, counts, r8, p_gauss,
                sorted_key=inst.sorted_key,
            )
            color_t, T_t, n_t = composite_instances_seg(
                means2d,
                prep.conic,
                rgb,
                prep.opacity,
                bg,
                seg.sorted_g8,
                seg.starts8,
                seg.counts,
                seg.live8,
                seg.ride_d,
                seg.ride_t,
                seg.e8,
                inst.seg_lo,
                inst.seg_hi,
                inst.perm,
                inst.inv_perm,
                jnp.int32(0),
                gx * gy,
                gx,
                config.interpret,
            )
            image = _tiles_to_image(color_t, gx, gy, W, H)
            final_T = jax.lax.stop_gradient(
                _tiles_to_image(T_t, gx, gy, W, H)
            )
            n_contrib = _tiles_to_image(n_t, gx, gy, W, H)
            return RenderResult(
                image=image,
                radii=prep.radii,
                final_T=final_T,
                n_contrib=n_contrib,
                overflow=jnp.zeros((), jnp.int32),
                truncated=truncated + seg.truncated,
            )
        cap = config.aligned_cap
        # (sorted_e is NOT trimmed: the gather reduction needs every
        # survivor rank present — trimmed slab rows read the zero pad row)
        if cap is not None and cap < sorted_g.shape[0]:
            # trim the slab to its live prefix: downstream gathers/scatters
            # scale with slab length, and the live segments occupy only
            # the front of the sorted array
            if config.ghost_align:
                padded = ((counts + PCHUNK - 1) // PCHUNK) * PCHUNK
                fits = starts + padded <= cap
            else:
                fits = starts + counts <= cap
            truncated = truncated + jnp.sum(jnp.where(fits, 0, counts))
            counts = jnp.where(fits, counts, 0)
            starts = jnp.clip(starts, 0, cap - 1)
            sorted_g = sorted_g[:cap]
        t_ids = np.arange(gx * gy)
        x0 = jnp.asarray((t_ids % gx) * TILE, jnp.int32)
        y0 = jnp.asarray((t_ids // gx) * TILE, jnp.int32)
        color_t, T_t, n_t = composite_instances(
            means2d,
            prep.conic,
            rgb,
            prep.opacity,
            bg,
            sorted_g,
            starts,
            counts,
            x0,
            y0,
            sorted_e,
            inst.seg_lo,
            inst.seg_hi,
            inst.perm,
            inst.inv_perm,
            gx * gy,
            config.interpret,
            config.want_ncontrib,
            config.fused_reduce,
        )
        overflow = jnp.zeros((), jnp.int32)  # no per-tile cap in this path
    else:
        binned = bin_gaussians(
            prep_sg,
            gx,
            gy,
            config.max_instances,
            config.tile_cap,
        )
        color_t, T_t, n_t = _composite_tiles(
            means2d,
            prep.conic,
            rgb,
            prep.opacity,
            bg,
            binned.tile_ids,
            binned.tile_mask,
            _tile_pixel_coords(gx, gy),
            config.chunk,
        )
        overflow = binned.overflow
        truncated = binned.truncated
        # the XLA compositor keeps its channels-minor scan layout (CPU/test
        # backend); convert to the channels-first convention here
        color_t = jnp.swapaxes(color_t, 1, 2)
    image = _tiles_to_image(color_t, gx, gy, W, H)
    final_T = jax.lax.stop_gradient(_tiles_to_image(T_t, gx, gy, W, H))
    n_contrib = _tiles_to_image(n_t, gx, gy, W, H)
    return RenderResult(
        image=image,
        radii=prep.radii,
        final_T=final_T,
        n_contrib=n_contrib,
        overflow=overflow,
        truncated=truncated,
    )
