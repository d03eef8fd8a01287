"""Gaussian covariance math: quaternion → R, 3D covariance, EWA 2D covariance.

Semantics match the reference kernels (`/root/reference/cuda_rasterizer/
forward.cu:86-228`), written in plain matrix form. Unwinding the reference's
glm column-major bookkeeping, its computations are exactly:

  Σ₃         = R · diag(s²) · Rᵀ                      (computeCov3D)
  cov2D      = J · R_cw · Σ₃ · R_cwᵀ · Jᵀ + 0.3·I     (computeCov2D{,Lonlat})

with J the (2, 3) projection Jacobian and R_cw = viewmatrix[:3, :3]. The
quaternion convention is (w, x, y, z) and — like the in-kernel reference
(`forward.cu:203`) — quaternions are consumed as-is: normalization is the
model activation's job (`gaussian_model.cpp:59-62`).

cov3d packing: 6-vector [xx, xy, xz, yy, yz, zz] (upper triangle,
`forward.cu:221-227`).
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(w, x, y, z) quaternion(s) → (..., 3, 3) rotation matrices.

    Assumes unit quaternions (the model activation normalizes).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def build_cov3d(
    scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """(..., 3) activated scales + (..., 4) quats → packed (..., 6) Σ₃.

    Σ₃ = R diag(s²) Rᵀ; packing [xx, xy, xz, yy, yz, zz].
    """
    R = quat_to_rotmat(quats)
    s = scales * scale_modifier
    M = R * s[..., None, :]  # R @ diag(s)
    sigma = M @ jnp.swapaxes(M, -1, -2)
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_cov3d(cov6: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., 6) → full symmetric (..., 3, 3)."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


LOW_PASS = 0.3  # EWA anti-alias floor, added without gradient (`forward.cu:124,185`)


def project_cov3d(
    cov6: jnp.ndarray, J: jnp.ndarray, R_cw: jnp.ndarray
) -> jnp.ndarray:
    """EWA projection: (..., 6) Σ₃ + (..., 2, 3) J + (3, 3) R_cw → (..., 3) cov2D.

    Returns packed [a, b, c] for the symmetric 2×2 [[a, b], [b, c]], with the
    +0.3 low-pass already applied to the diagonal.
    """
    sigma = unpack_cov3d(cov6)
    T = J @ R_cw  # (..., 2, 3)
    cov = T @ sigma @ jnp.swapaxes(T, -1, -2)
    a = cov[..., 0, 0] + LOW_PASS
    b = cov[..., 0, 1]
    c = cov[..., 1, 1] + LOW_PASS
    return jnp.stack([a, b, c], axis=-1)


def build_cov3d_components(
    scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0
):
    """Σ₃ = R diag(s²) Rᵀ expanded into six (...,) component columns
    (xx, xy, xz, yy, yz, zz).

    Batched (P, 3, 3) matmuls lower to bf16 convolutions with tiny-tile
    layouts on TPU (measured ~20 ms of the preprocess at P=131k, including
    the layout copies); the same math as ~40 full-width VPU ops is ~1 ms.
    """
    w, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = (
        (1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)),
    )
    s = [scales[..., k] * scale_modifier for k in range(3)]
    m = [[r[i][k] * s[k] for k in range(3)] for i in range(3)]

    def dot(i, jj):
        return m[i][0] * m[jj][0] + m[i][1] * m[jj][1] + m[i][2] * m[jj][2]

    return dot(0, 0), dot(0, 1), dot(0, 2), dot(1, 1), dot(1, 2), dot(2, 2)


def project_cov3d_components(cov6, j_rows, R_cw):
    """EWA projection in component form.

    Args:
      cov6: 6-tuple of (...,) Σ₃ components (xx, xy, xz, yy, yz, zz).
      j_rows: 2-tuple of 3-tuples of (...,) Jacobian entries J[r][k].
      R_cw: (3, 3) camera rotation (single matrix; entries become traced
        scalars).

    Returns (a, b, c) of the 2×2 cov2D with the +0.3 low-pass applied.
    """
    sig = (
        (cov6[0], cov6[1], cov6[2]),
        (cov6[1], cov6[3], cov6[4]),
        (cov6[2], cov6[4], cov6[5]),
    )
    # T = J @ R_cw (R_cw entries are scalars)
    t = [
        [
            j_rows[r][0] * R_cw[0, c]
            + j_rows[r][1] * R_cw[1, c]
            + j_rows[r][2] * R_cw[2, c]
            for c in range(3)
        ]
        for r in range(2)
    ]
    # U = T @ Σ₃ ; cov = U @ Tᵀ
    u = [
        [
            t[r][0] * sig[0][c] + t[r][1] * sig[1][c] + t[r][2] * sig[2][c]
            for c in range(3)
        ]
        for r in range(2)
    ]

    def dot(r, c):
        return u[r][0] * t[c][0] + u[r][1] * t[c][1] + u[r][2] * t[c][2]

    return dot(0, 0) + LOW_PASS, dot(0, 1), dot(1, 1) + LOW_PASS


def invert_cov2d_components(a, b, c):
    """(a, b, c) cov2D components → (conic components (A, B, C), det)."""
    det = a * c - b * b
    safe = jnp.where(det != 0.0, det, 1.0)
    det_inv = jnp.where(det != 0.0, 1.0 / safe, 0.0)
    return (c * det_inv, -b * det_inv, a * det_inv), det


def cov2d_extent_components(a, c, det, opacity=None):
    """Component form of `cov2d_extent`."""
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    k = 3.0
    if opacity is not None:
        k = jnp.minimum(
            3.0, jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1e-6)))
        )
        k = jnp.maximum(k, 0.0)
    return jnp.ceil(k * jnp.sqrt(lam_max))


def invert_cov2d(cov2d: jnp.ndarray):
    """Packed cov2D → (conic, det). Conic = inverse, packed [A, B, C].

    det == 0 marks a degenerate Gaussian the reference drops
    (`forward.cu:660-664`).
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    safe = jnp.where(det != 0.0, det, 1.0)
    det_inv = jnp.where(det != 0.0, 1.0 / safe, 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)
    return conic, det


def cov2d_extent(
    cov2d: jnp.ndarray, det: jnp.ndarray, opacity: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Screen-space radius = ⌈3·√λ_max⌉ (`forward.cu:671-674`).

    With ``opacity``, the radius tightens to where α falls below the
    compositor's 1/255 skip threshold: α = op·exp(−r²/2λ) < 1/255 ⇔
    r > √(2·ln(255·op))·√λ. Instances outside that radius are *skipped* by
    the render loop anyway (`forward.cu:436-438`), so tight culling is
    output-identical — it only shrinks the binning workload (and, for
    op ≤ 1/255, culls the Gaussian outright). Capped at the reference's 3σ.
    """
    a, c = cov2d[..., 0], cov2d[..., 2]
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    k = 3.0
    if opacity is not None:
        k = jnp.minimum(
            3.0, jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1e-6)))
        )
        k = jnp.maximum(k, 0.0)
    return jnp.ceil(k * jnp.sqrt(lam_max))
