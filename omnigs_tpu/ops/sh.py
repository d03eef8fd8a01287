"""Real spherical harmonics → RGB, vectorized over Gaussians.

Mirrors the semantics of `computeColorFromSH`
(`/root/reference/cuda_rasterizer/forward.cu:30-83`): view direction is the
normalized (mean - campos), result gets +0.5 offset and is clamped to be
non-negative; the clamp mask is what the backward uses to zero gradients
(PyTorch clamp rule, `backward.cu:40-45`). Here clamping is plain
``jnp.maximum`` so JAX autodiff applies the identical rule for free.

Layout: sh coefficients are (..., M, 3) with M = (deg+1)², dc first —
matching the reference feature order (`gaussian_model.cpp:144-156`).
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions. ``degree`` is static (0..3).

    Args:
      sh: (..., M, 3) coefficients with M >= (degree+1)².
      dirs: (..., 3) unit view directions.

    Returns (..., 3) raw colors (before the +0.5 offset / clamp).
    """
    result = SH_C0 * sh[..., 0, :]
    if degree > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result - SH_C1 * y * sh[..., 1, :] + SH_C1 * z * sh[..., 2, :]
            - SH_C1 * x * sh[..., 3, :]
        )
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if degree > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_rgb(
    degree: int, sh: jnp.ndarray, means: jnp.ndarray, campos: jnp.ndarray
) -> jnp.ndarray:
    """SH → clamped RGB as the rasterizer preprocess does (`forward.cu:30-83`)."""
    d = means - campos
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1.0e-12)
    return jnp.maximum(eval_sh(degree, sh, d) + 0.5, 0.0)


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """`/root/reference/include/sh_utils.h:138-141`."""
    return (rgb - 0.5) / SH_C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * SH_C0 + 0.5
