"""Mean squared 3-NN distance for scale initialization.

TPU replacement for the vendored simple-knn CUDA kernel
(`/root/reference/third_party/simple-knn/spatial.cu:15-26`,
`simple_knn.cu:185-221`): the reference Morton-sorts points and box-culls an
exact 3-NN search. Here the one-shot init cost is paid with chunked dense
distance blocks — O(N²) FLOPs but fully MXU-shaped (a (chunk, N) matmul per
block), which at N ≈ 10⁵–10⁶ is milliseconds on a TPU chip and requires no
irregular data structures. Masked for padded/inactive slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("chunk", "k"))
def mean_sq_knn_dist(
    points: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    chunk: int = 1024,
    k: int = 3,
) -> jnp.ndarray:
    """(N, 3) points → (N,) mean of squared distances to the k nearest others.

    Args:
      mask: optional (N,) bool; masked-out points are excluded as neighbors
        and get result 0.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pts = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    msk = jnp.pad(mask, (0, n_pad - n))

    sq = jnp.sum(pts * pts, axis=-1)

    def block(start):
        p = jax.lax.dynamic_slice_in_dim(pts, start, chunk)
        p_sq = jax.lax.dynamic_slice_in_dim(sq, start, chunk)
        # ‖a-b‖² = ‖a‖² + ‖b‖² − 2a·b   (the inner product rides the MXU)
        d2 = (
            p_sq[:, None]
            + sq[None, :]
            - 2.0 * p @ pts.T
        )
        d2 = jnp.maximum(d2, 0.0)
        # exclude self and masked-out neighbors
        idx = start + jnp.arange(chunk)
        self_mask = idx[:, None] == jnp.arange(n_pad)[None, :]
        d2 = jnp.where(self_mask | ~msk[None, :], jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        top = -neg_top
        top = jnp.where(jnp.isinf(top), 0.0, top)
        return jnp.mean(top, axis=-1)

    starts = jnp.arange(0, n_pad, chunk)
    out = jax.lax.map(block, starts).reshape(-1)[:n]
    return jnp.where(mask, out, 0.0)
