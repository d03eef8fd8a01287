"""Densification (clone/split), pruning, and opacity reset on static capacity.

Replicates the reference's adaptive-density control
(`/root/reference/src/gaussian_model.cpp:733-853,564-573`) without dynamic
tensor shapes: candidates are written into *free capacity slots* chosen by a
prefix-sum allocator, split parents are deactivated, and Adam moments of the
touched slots are zeroed — semantically identical to the reference's
cat/prune optimizer surgery (`gaussian_model.cpp:605-731`) but recompile-free
and O(P) deterministic.

Ordering matches the reference `densifyAndPrune` (`gaussian_model.cpp:812-837`):
clone first, then split (both masks computed from the same pre-densify grads —
the reference pads new clones' grads with zeros so they never split in the
same round), then prune by opacity/screen-size/world-size. Stats
(grad accum, denom, max_radii2D) reset for all points afterwards
(`gaussian_model.cpp:726-730`).

Capacity overflow policy: if free slots run out, excess candidates are
dropped deterministically (clones before children, ascending slot order) and
the drop count is reported — never a silent wraparound.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from omnigs_tpu.model.gaussians import GaussianModel, PARAM_NAMES, inverse_sigmoid
from omnigs_tpu.model.optimizer import AdamState, zero_moments
from omnigs_tpu.ops.covariance import quat_to_rotmat

SPLIT_N = 2  # children per split (`gaussian_model.cpp:169` default arg N=2)


class DensifyStats(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    num_dropped: jnp.ndarray  # candidates lost to capacity exhaustion


def _scatter_new_items(model: GaussianModel, items: dict, valid: jnp.ndarray):
    """Allocate `valid` new items into free slots. Returns (model, placed_mask,
    slot_written_mask, dropped_count)."""
    P = model.capacity
    free = ~model.active
    n_free = jnp.sum(free)
    # free slots in ascending index order
    free_slots = jnp.argsort(~free, stable=True)
    rank = jnp.cumsum(valid) - 1
    placed = valid & (rank < n_free)
    target = jnp.where(placed, free_slots[jnp.clip(rank, 0, P - 1)], P)

    updates = {}
    for name in PARAM_NAMES:
        base = getattr(model, name)
        padded = jnp.concatenate([base, jnp.zeros_like(base[:1])], axis=0)
        padded = padded.at[target].set(items[name], mode="drop")
        updates[name] = padded[:P]
    active = jnp.concatenate([model.active, jnp.zeros((1,), bool)])
    active = active.at[target].set(True, mode="drop")[:P]
    exist = jnp.concatenate([model.exist_since_iter, jnp.zeros((1,), jnp.int32)])
    exist = exist.at[target].set(items["exist_since_iter"], mode="drop")[:P]

    slot_written = jnp.zeros((P + 1,), bool).at[target].set(True, mode="drop")[:P]
    dropped = jnp.sum(valid & ~placed)
    model = model.replace(active=active, exist_since_iter=exist, **updates)
    return model, slot_written, dropped


def densify_and_prune(
    model: GaussianModel,
    opt_state: AdamState,
    key: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent,
    max_screen_size: int,
    percent_dense: float,
    prune_by_extent: bool,
    iteration,
):
    """`densifyAndPrune` (`gaussian_model.cpp:812-837`) on static capacity."""
    P = model.capacity
    grads = model.xyz_gradient_accum / jnp.maximum(model.denom, 1e-12)
    grads = jnp.where(model.denom > 0, grads, 0.0)

    scale_act = model.get_scaling()
    max_scale = jnp.max(scale_act, axis=-1)
    hot = model.active & (grads >= max_grad)
    small = max_scale <= percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small

    # --- candidate items: [clones | child0 | child1], each P entries ---
    def parent_params(name):
        return getattr(model, name)

    # split children: xyz sampled ~ N(0, diag(scale)) rotated into world
    # (`densifyAndSplit`, `gaussian_model.cpp:733-778`)
    R = quat_to_rotmat(model.get_rotation())  # (P, 3, 3)
    noise = jax.random.normal(key, (SPLIT_N, P, 3)) * scale_act[None]
    child_xyz = (
        jnp.einsum("pij,npj->npi", R, noise) + model.xyz[None]
    )  # (SPLIT_N, P, 3)
    child_scaling = jnp.log(scale_act / (0.8 * SPLIT_N))

    items = {}
    for name in PARAM_NAMES:
        p = parent_params(name)
        if name == "xyz":
            stacked = jnp.concatenate([p, child_xyz[0], child_xyz[1]], axis=0)
        elif name == "scaling":
            stacked = jnp.concatenate([p, child_scaling, child_scaling], axis=0)
        else:
            stacked = jnp.concatenate([p, p, p], axis=0)
        items[name] = stacked
    items["exist_since_iter"] = jnp.tile(
        jnp.full((P,), iteration, jnp.int32), (3,)
    )
    valid = jnp.concatenate([clone_mask, split_mask, split_mask])

    model, slot_written, dropped = _scatter_new_items(model, items, valid)
    # zero Adam moments at freshly written slots (densificationPostfix zeroes
    # the concatenated extension's moments)
    opt_state = zero_moments(opt_state, slot_written)

    # deactivate split parents (`prune_filter`, `gaussian_model.cpp:775-778`)
    model = model.replace(active=model.active & ~split_mask)

    # --- prune (`gaussian_model.cpp:830-836`) ---
    opacity_act = model.get_opacity()
    prune = opacity_act < min_opacity
    if max_screen_size:
        big_vs = model.max_radii2d > max_screen_size
        if prune_by_extent:
            big_ws = jnp.max(model.get_scaling(), axis=-1) > 0.1 * extent
        else:
            big_ws = jnp.zeros_like(big_vs)
        prune = prune | big_vs | big_ws
    # newly placed slots have zeroed max_radii2d, matching the reference's
    # postfix stat reset happening before the prune
    num_pruned = jnp.sum(model.active & prune)
    model = model.replace(active=model.active & ~prune)

    # stat reset for all points (`gaussian_model.cpp:726-730`)
    model = model.replace(
        xyz_gradient_accum=jnp.zeros_like(model.xyz_gradient_accum),
        denom=jnp.zeros_like(model.denom),
        max_radii2d=jnp.zeros_like(model.max_radii2d),
    )
    stats = DensifyStats(
        num_cloned=jnp.sum(clone_mask),
        num_split=jnp.sum(split_mask),
        num_pruned=num_pruned,
        num_dropped=dropped,
    )
    return model, opt_state, stats


def reset_opacity(model: GaussianModel, opt_state: AdamState):
    """`resetOpacity` (`gaussian_model.cpp:564-573`): clamp activated opacity
    to ≤ 0.01, re-logit, and zero the opacity group's Adam moments
    (`replaceTensorToOptimizer` zeroes the whole group)."""
    new_op = inverse_sigmoid(jnp.minimum(model.get_opacity(), 0.01))[:, None]
    model = model.replace(
        opacity=jnp.where(model.active[:, None], new_op, model.opacity)
    )
    opt_state = zero_moments(
        opt_state, jnp.ones((model.capacity,), bool), names=("opacity",)
    )
    return model, opt_state


def add_densification_stats(
    model: GaussianModel, ndc_grads: jnp.ndarray, radii: jnp.ndarray
) -> GaussianModel:
    """`addDensificationStats` (`gaussian_model.cpp:839-853`) + the
    max_radii2D update from the training loop (`src/gaussian_mapper.cpp:427-434`)."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(ndc_grads[:, :2], axis=-1)
    return model.replace(
        xyz_gradient_accum=model.xyz_gradient_accum
        + jnp.where(visible, gnorm, 0.0),
        denom=model.denom + visible.astype(model.denom.dtype),
        max_radii2d=jnp.where(
            visible, jnp.maximum(model.max_radii2d, radii), model.max_radii2d
        ),
    )
