"""Point-ops: visibility marking, Sim(3) model re-transforms, mid-training
point insertion — the SLAM-heritage surface of the reference.

TPU equivalents of `markVisible` (`/root/reference/src/rasterize_points.cu:
287-319`, `cuda_rasterizer/rasterizer_impl.cu:69-90,169-192`),
`transformPoints` / `scaleAndTransformThenMarkVisiblePoints`
(`src/operate_points.cu:76-148`), `GaussianModel::applyScaledTransformation`
/ `scaledTransformVisiblePointsOfKeyframe` (`src/gaussian_model.cpp:385-483`)
and `increasePcd` (`src/gaussian_model.cpp:199-383`). All are masked
vectorized ops on the fixed-capacity model; optimizer-moment zeroing mirrors
the reference's `replaceTensorToOptimizer` surgery.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from omnigs_tpu.cameras import CameraType, world_to_cam
from omnigs_tpu.model.densify import _scatter_new_items
from omnigs_tpu.model.gaussians import GaussianModel, inverse_sigmoid
from omnigs_tpu.model.optimizer import AdamState, zero_moments
from omnigs_tpu.ops import sh as sh_ops


def mark_visible(
    points: jnp.ndarray,
    viewmatrix: jnp.ndarray,
    camera_type: CameraType,
) -> jnp.ndarray:
    """Frustum-cull predicate. Reference quirk preserved: the lonlat variant
    marks everything visible (`rasterizer_impl.cu:82-90,185-192`); pinhole
    culls camera-space z ≤ 0.2 (`auxiliary.h:166-196`)."""
    if camera_type == CameraType.LONLAT:
        return jnp.ones(points.shape[:-1], bool)
    t = world_to_cam(points, viewmatrix)
    return t[..., 2] > 0.2


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """(w, x, y, z) Hamilton product, broadcasting."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(3, 3) rotation → (w, x, y, z) unit quaternion (branch-free Shepperd)."""
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22
    qs = jnp.stack(
        [
            jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)),
            jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)),
            jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)),
            jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)),
        ]
    )
    case = jnp.argmax(qs)
    cands = jnp.stack(
        [
            jnp.stack([qs[0], (m21 - m12) / qs[0], (m02 - m20) / qs[0], (m10 - m01) / qs[0]]),
            jnp.stack([(m21 - m12) / qs[1], qs[1], (m01 + m10) / qs[1], (m02 + m20) / qs[1]]),
            jnp.stack([(m02 - m20) / qs[2], (m01 + m10) / qs[2], qs[2], (m12 + m21) / qs[2]]),
            jnp.stack([(m10 - m01) / qs[3], (m02 + m20) / qs[3], (m12 + m21) / qs[3], qs[3]]),
        ]
    )
    q = 0.5 * cands[case]
    return q / jnp.linalg.norm(q)


def apply_scaled_transformation(
    model: GaussianModel,
    opt_state: AdamState,
    s: float,
    T: jnp.ndarray,
) -> Tuple[GaussianModel, AdamState]:
    """Sim(3) re-transform of the whole model: xyz ← T·(s·xyz), log-scales
    shifted by log(s); xyz/scaling Adam moments zeroed
    (`applyScaledTransformation`, `gaussian_model.cpp:385-404`).

    Note: the reference multiplies the *log*-scaling tensor by s
    (`gaussian_model.cpp:402`), which scales Gaussian extents by pow(scale, s)
    rather than by s — we apply the mathematically intended `+ log(s)`.
    Quaternions also rotate by T's rotation (the reference leaves them,
    which is only correct for identity rotations).
    """
    xyz = (s * model.xyz) @ T[:3, :3].T + T[:3, 3]
    scaling = model.scaling + jnp.log(s)
    qT = rotmat_to_quat(T[:3, :3])
    rotation = quat_multiply(qT[None, :], model.rotation)
    model = model.replace(xyz=xyz, scaling=scaling, rotation=rotation)
    opt_state = zero_moments(
        opt_state,
        jnp.ones((model.capacity,), bool),
        names=("xyz", "scaling", "rotation"),
    )
    return model, opt_state


def scaled_transform_visible_points(
    model: GaussianModel,
    opt_state: AdamState,
    not_transformed: jnp.ndarray,
    diff_pose: jnp.ndarray,
    kf_viewmatrix: jnp.ndarray,
    kf_creation_iter: int,
    stable_num_iter_existence: int,
    camera_type: CameraType,
    scale: float = 1.0,
):
    """Loop-closure correction: re-transform the *unstable, visible, not yet
    transformed* points by `diff_pose` (`scaledTransformVisiblePointsOfKeyframe`,
    `gaussian_model.cpp:422-483`). Returns (model, opt_state,
    not_transformed', num_transformed)."""
    unstable = (
        jnp.abs(model.exist_since_iter - kf_creation_iter)
        < stable_num_iter_existence
    )
    present = mark_visible(model.xyz, kf_viewmatrix, camera_type)
    mask = not_transformed & unstable & present & model.active

    new_xyz = (scale * model.xyz) @ diff_pose[:3, :3].T + diff_pose[:3, 3]
    qT = rotmat_to_quat(diff_pose[:3, :3])
    new_rot = quat_multiply(qT[None, :], model.get_rotation())

    model = model.replace(
        xyz=jnp.where(mask[:, None], new_xyz, model.xyz),
        rotation=jnp.where(mask[:, None], new_rot, model.rotation),
    )
    opt_state = zero_moments(
        opt_state, jnp.ones((model.capacity,), bool), names=("xyz", "rotation")
    )
    num_transformed = jnp.sum(mask)
    return model, opt_state, not_transformed & ~mask, num_transformed


def increase_pcd(
    model: GaussianModel,
    opt_state: AdamState,
    points: jnp.ndarray,
    colors: jnp.ndarray,
    mean_sq_nn_dist: jnp.ndarray,
    iteration,
):
    """Append SfM points mid-training into free capacity slots
    (`increasePcd`, `gaussian_model.cpp:199-383`): RGB→SH dc, knn scale,
    identity rotation, opacity 0.1, zeroed moments at the new slots."""
    n = points.shape[0]
    scale = jnp.log(jnp.sqrt(jnp.maximum(mean_sq_nn_dist, 1e-7)))
    pad = model.capacity - n
    assert pad >= 0, "more new points than capacity"

    def padded(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )

    items = {
        "xyz": padded(points),
        "features_dc": padded(sh_ops.rgb2sh(colors)[:, None, :]),
        "features_rest": jnp.zeros_like(model.features_rest),
        "scaling": padded(jnp.repeat(scale[:, None], 3, axis=1)),
        "rotation": padded(
            jnp.tile(jnp.array([1.0, 0, 0, 0], points.dtype), (n, 1))
        ),
        "opacity": padded(
            jnp.full((n, 1), inverse_sigmoid(jnp.asarray(0.1)), points.dtype)
        ),
        "exist_since_iter": jnp.full((model.capacity,), iteration, jnp.int32),
    }
    valid = jnp.arange(model.capacity) < n
    model, slot_written, dropped = _scatter_new_items(model, items, valid)
    opt_state = zero_moments(opt_state, slot_written)
    return model, opt_state, dropped
