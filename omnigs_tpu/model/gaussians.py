"""Gaussian radiance-field parameters as a fixed-capacity pytree.

The reference `GaussianModel` (`/root/reference/include/gaussian_model.h:66-203`,
`src/gaussian_model.cpp`) stores 6 learnable tensors whose leading dimension
grows/shrinks during densification, forcing Adam-state surgery
(`gaussian_model.cpp:575-731`). On TPU dynamic shapes mean recompiles, so here
the model has a *static* capacity ``P_max`` and a boolean ``active`` mask:
densify/prune become masked writes into free slots (see `model/densify.py`)
and the optimizer state never changes shape.

Parameter semantics match the reference exactly
(`gaussian_model.cpp:54-107,120-197`):
  * ``xyz``            (P, 3)    world positions
  * ``features_dc``    (P, 1, 3) SH degree-0 coefficients
  * ``features_rest``  (P, 15, 3) SH degree-1..3 coefficients
  * ``scaling``        (P, 3)    log-scales (activation: exp)
  * ``rotation``       (P, 4)    unnormalized quaternions (w, x, y, z)
                                 (activation: normalize)
  * ``opacity``        (P, 1)    logits (activation: sigmoid)
"""

from __future__ import annotations

from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp

from omnigs_tpu.ops import sh as sh_ops

MAX_SH_DEGREE = 3
SH_REST = (MAX_SH_DEGREE + 1) ** 2 - 1  # 15

PARAM_NAMES = (
    "xyz",
    "features_dc",
    "features_rest",
    "scaling",
    "rotation",
    "opacity",
)


def inverse_sigmoid(x):
    """`/root/reference/include/general_utils.h:29-33`."""
    return jnp.log(x / (1.0 - x))


@flax.struct.dataclass
class GaussianModel:
    # learnable (leaves that receive gradients)
    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    # capacity bookkeeping + densification stats (non-learnable)
    active: jnp.ndarray  # (P,) bool
    max_radii2d: jnp.ndarray  # (P,) float
    xyz_gradient_accum: jnp.ndarray  # (P,) float
    denom: jnp.ndarray  # (P,) float
    exist_since_iter: jnp.ndarray  # (P,) int32

    # ---- construction ----

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32) -> "GaussianModel":
        return cls(
            xyz=jnp.zeros((capacity, 3), dtype),
            features_dc=jnp.zeros((capacity, 1, 3), dtype),
            features_rest=jnp.zeros((capacity, SH_REST, 3), dtype),
            scaling=jnp.full((capacity, 3), -10.0, dtype),
            rotation=jnp.zeros((capacity, 4), dtype).at[:, 0].set(1.0),
            opacity=jnp.full((capacity, 1), -10.0, dtype),
            active=jnp.zeros((capacity,), bool),
            max_radii2d=jnp.zeros((capacity,), dtype),
            xyz_gradient_accum=jnp.zeros((capacity,), dtype),
            denom=jnp.zeros((capacity,), dtype),
            exist_since_iter=jnp.zeros((capacity,), jnp.int32),
        )

    # ---- views ----

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active)

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / (
            jnp.linalg.norm(self.rotation, axis=-1, keepdims=True) + 1e-12
        )

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity[:, 0])

    def get_features(self) -> jnp.ndarray:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def params(self) -> Dict[str, jnp.ndarray]:
        """The learnable subtree handed to the optimizer."""
        return {k: getattr(self, k) for k in PARAM_NAMES}

    def with_params(self, params: Dict[str, jnp.ndarray]) -> "GaussianModel":
        return self.replace(**params)


def from_pcd(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    capacity: int,
    mean_sq_nn_dist: jnp.ndarray,
) -> GaussianModel:
    """`createFromPcd` (`gaussian_model.cpp:120-197`): SfM points → model.

    Args:
      points: (N, 3) positions (N ≤ capacity).
      colors: (N, 3) RGB in [0, 1].
      mean_sq_nn_dist: (N,) mean squared 3-NN distance (see ops/knn.py),
        clamped ≥ 1e-7 before the log-sqrt like the reference.
    """
    n = points.shape[0]
    assert n <= capacity, (n, capacity)
    m = GaussianModel.empty(capacity, points.dtype)
    scale = jnp.log(jnp.sqrt(jnp.maximum(mean_sq_nn_dist, 1e-7)))
    m = m.replace(
        xyz=m.xyz.at[:n].set(points),
        features_dc=m.features_dc.at[:n, 0].set(sh_ops.rgb2sh(colors)),
        scaling=m.scaling.at[:n].set(scale[:, None].repeat(3, 1)),
        rotation=m.rotation.at[:n].set(
            jnp.tile(jnp.array([1.0, 0, 0, 0], points.dtype), (n, 1))
        ),
        opacity=m.opacity.at[:n].set(
            jnp.full((n, 1), inverse_sigmoid(jnp.asarray(0.1)), points.dtype)
        ),
        active=m.active.at[:n].set(True),
    )
    return m
