"""M0: brute-force differentiable rasterizer — the semantic ground truth.

Replicates the reference compositing semantics (`/root/reference/
cuda_rasterizer/forward.cu:346-467`) exactly, but densely: every pixel tests
every Gaussian (masked by the tile binning predicate), sorted by depth, with
the numerical-robustness rules
  * alpha = min(0.99, opacity · G), skipped (→ 0) when G's exponent > 0,
  * skipped when alpha < 1/255,
  * compositing stops once transmittance would drop below 1e-4
expressed as closed-form masked cumulative products, so plain `jax.grad`
through this function implements the same gradient the reference hand-derives
(`backward.cu:672-843`) — including the early-termination cutoff.

Used as the differentiable oracle for unit tests and as the allclose target
for the tile-binned rasterizer and Pallas kernels. O(pixels × P): fine for
tests, not for production.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from omnigs_tpu.cameras import Camera
from omnigs_tpu.ops.preprocess import TILE, Preprocessed

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_STOP = 1.0e-4


def composite_pixels(
    pix: jnp.ndarray,
    order: jnp.ndarray,
    prep: Preprocessed,
    bg: jnp.ndarray,
    tile_mask_fn=None,
):
    """Composite a batch of pixels against depth-sorted Gaussians.

    Args:
      pix: (N, 2) float pixel centers.
      order: (P,) depth-ascending gaussian indices (stable sort — ties keep
        index order like the reference's stable radix sort).
      prep: preprocessed gaussians.
      bg: (3,) background color.
      tile_mask_fn: optional fn(pix) -> (N, P) bool of which *sorted*
        gaussians this pixel's tile contains.

    Returns (color (N, 3), final_T (N,), n_contrib (N,)).
    """
    means2d = prep.means2d[order]
    conic = prep.conic[order]
    rgb = prep.rgb[order]
    opacity = prep.opacity[order]

    d = means2d[None, :, :] - pix[:, None, :]  # (N, P, 2)
    power = (
        -0.5
        * (
            conic[None, :, 0] * d[..., 0] * d[..., 0]
            + conic[None, :, 2] * d[..., 1] * d[..., 1]
        )
        - conic[None, :, 1] * d[..., 0] * d[..., 1]
    )
    alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    live = power <= 0.0
    if tile_mask_fn is not None:
        in_tile = tile_mask_fn(pix)
        live = live & in_tile
    else:
        in_tile = jnp.ones_like(live)
    live = live & (alpha >= ALPHA_MIN)
    a = jnp.where(live, alpha, 0.0)

    one_m_a = 1.0 - a
    incl_T = jnp.cumprod(one_m_a, axis=-1)  # T after compositing i
    excl_T = incl_T / one_m_a  # T before compositing i (a < 1 ⇒ safe)
    contribute = incl_T >= T_STOP  # reference stops *before* the crossing hit
    w = a * excl_T * contribute

    color = jnp.einsum("np,pc->nc", w, rgb)
    final_T = jnp.prod(jnp.where(contribute, one_m_a, 1.0), axis=-1)
    color = color + final_T[:, None] * bg[None, :]

    rank = jnp.cumsum(in_tile.astype(jnp.int32), axis=-1)
    n_contrib = jnp.max(
        jnp.where(live & contribute, rank, 0), axis=-1
    )
    return color, final_T, n_contrib


def render_oracle(
    prep: Preprocessed,
    camera: Camera,
    bg: jnp.ndarray,
    row_chunk: int = 16,
    tile_accurate: bool = True,
    features: Optional[jnp.ndarray] = None,
):
    """Render the full image. Differentiable.

    Args:
      tile_accurate: if True, a pixel only sees Gaussians whose tile rect
        covers its tile (exact parity with the binned rasterizer, including
        the non-cyclic seam clipping). If False, every valid Gaussian is
        visible to every pixel.
      features: optional (P, C) override of the composited per-Gaussian
        features (e.g. depths for depth rendering, `forward.cu:472-590`).

    Returns (image (3, H, W) — channels-first like the binned
    rasterizers, final_T (H, W), n_contrib (H, W)).
    """
    W, H = camera.width, camera.height
    order = jnp.argsort(prep.depths, stable=True)
    prep_r = prep
    if features is not None:
        f = features if features.ndim == 2 else features[:, None]
        if f.shape[1] == 1:
            f = jnp.tile(f, (1, 3))
        prep_r = prep._replace(rgb=f)

    rect_sorted = prep.rect[order]
    valid_sorted = prep.valid[order]

    def tile_mask_fn(pix):
        tx = (pix[:, 0:1] // TILE).astype(jnp.int32)
        ty = (pix[:, 1:2] // TILE).astype(jnp.int32)
        m = (
            (rect_sorted[None, :, 0] <= tx)
            & (tx < rect_sorted[None, :, 2])
            & (rect_sorted[None, :, 1] <= ty)
            & (ty < rect_sorted[None, :, 3])
        )
        return m & valid_sorted[None, :]

    mask_fn = tile_mask_fn if tile_accurate else (
        lambda pix: jnp.broadcast_to(valid_sorted[None, :], (pix.shape[0], valid_sorted.shape[0]))
    )

    xs = jnp.arange(W, dtype=jnp.float32)

    def render_rows(y0):
        ys = y0 + jnp.arange(row_chunk, dtype=jnp.float32)
        px = jnp.stack(
            [
                jnp.tile(xs, (row_chunk,)),
                jnp.repeat(ys, W),
            ],
            axis=-1,
        )
        c, t, n = composite_pixels(px, order, prep_r, bg, mask_fn)
        return (
            c.reshape(row_chunk, W, 3),
            t.reshape(row_chunk, W),
            n.reshape(row_chunk, W),
        )

    n_chunks = (H + row_chunk - 1) // row_chunk
    y0s = jnp.arange(n_chunks, dtype=jnp.float32) * row_chunk
    color, final_T, n_contrib = jax.lax.map(render_rows, y0s)
    color = color.reshape(-1, W, 3)[:H].transpose(2, 0, 1)
    final_T = final_T.reshape(-1, W)[:H]
    n_contrib = n_contrib.reshape(-1, W)[:H]
    return color, final_T, n_contrib
