"""Grouped Adam with per-group LRs, the xyz log-lerp schedule, and
shape-stable "state surgery" for densification.

Mirrors `trainingSetup` (`/root/reference/src/gaussian_model.cpp:485-518`):
6 Adam groups with eps=1e-15, lrs {xyz: init·spatial_scale (scheduled),
f_dc: feature_lr, f_rest: feature_lr/20, opacity, scaling, rotation}, and the
Plenoxels-style exponential log-lerp schedule for xyz
(`gaussian_model.cpp:1140-1153`).

Because capacity is static, the reference's optimizer-state surgery
(`replaceTensorToOptimizer` / `prunePoints` / `densificationPostfix`,
`gaussian_model.cpp:575-731`) reduces to masked writes: new/replaced slots
get zeroed first/second moments; the shared step count is preserved — exactly
the reference semantics (new param states inherit the group's step).

Implemented directly (not via optax.adam) because slot-level moment surgery
is the core trick and we want it explicit and jit-stable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict

import flax.struct
import jax
import jax.numpy as jnp

from omnigs_tpu.model.gaussians import PARAM_NAMES

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


@dataclasses.dataclass(frozen=True)
class LRConfig:
    """`GaussianOptimizationParams` LR subset
    (`/root/reference/include/gaussian_parameters.h:64-102`)."""

    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    position_lr_delay_steps: int = 0
    feature_lr: float = 2.5e-3
    opacity_lr: float = 5.0e-2
    scaling_lr: float = 5.0e-3
    rotation_lr: float = 1.0e-3


@flax.struct.dataclass
class AdamState:
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    count: jnp.ndarray  # () int32, shared across groups (torch-equivalent)


def init_adam(params: Dict[str, jnp.ndarray]) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(
        mu=zeros,
        nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        count=jnp.zeros((), jnp.int32),
    )


def expon_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """`exponLrFunc` (`gaussian_model.cpp:1140-1153`), traced-step friendly."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(
        math.log(lr_init) * (1.0 - t) + math.log(lr_final) * t
    )
    return delay * log_lerp


def group_lrs(cfg: LRConfig, spatial_lr_scale: float, step) -> Dict[str, jnp.ndarray]:
    """Per-group LR dict at a (possibly traced) step."""
    xyz_lr = expon_lr(
        step,
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        cfg.position_lr_delay_steps,
        cfg.position_lr_delay_mult,
        cfg.position_lr_max_steps,
    )
    return {
        "xyz": xyz_lr,
        "features_dc": jnp.asarray(cfg.feature_lr),
        "features_rest": jnp.asarray(cfg.feature_lr / 20.0),
        "opacity": jnp.asarray(cfg.opacity_lr),
        "scaling": jnp.asarray(cfg.scaling_lr),
        "rotation": jnp.asarray(cfg.rotation_lr),
    }


def adam_step(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    active: jnp.ndarray,
):
    """One torch-semantics Adam step over all 6 groups, gated by `active`."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - BETA1**c
    bc2 = 1.0 - BETA2**c

    new_params, new_mu, new_nu = {}, {}, {}
    for name in PARAM_NAMES:
        g = grads[name]
        gate = active.reshape((-1,) + (1,) * (g.ndim - 1))
        g = jnp.where(gate, g, 0.0)
        mu = BETA1 * state.mu[name] + (1.0 - BETA1) * g
        nu = BETA2 * state.nu[name] + (1.0 - BETA2) * (g * g)
        update = (mu / bc1) / (jnp.sqrt(nu / bc2) + EPS)
        new_params[name] = params[name] - lrs[name] * jnp.where(gate, update, 0.0)
        new_mu[name] = mu
        new_nu[name] = nu
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)


def zero_moments(
    state: AdamState, slot_mask: jnp.ndarray, names=PARAM_NAMES
) -> AdamState:
    """Zero first/second moments at the given slots (densify/replace surgery)."""
    mu = dict(state.mu)
    nu = dict(state.nu)
    for name in names:
        gate = slot_mask.reshape((-1,) + (1,) * (mu[name].ndim - 1))
        mu[name] = jnp.where(gate, 0.0, mu[name])
        nu[name] = jnp.where(gate, 0.0, nu[name])
    return AdamState(mu=mu, nu=nu, count=state.count)
