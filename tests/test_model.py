"""Model pytree, KNN init, Adam parity vs torch, schedule, densify/prune."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from omnigs_tpu.model import densify as D
from omnigs_tpu.model import optimizer as O
from omnigs_tpu.model.gaussians import GaussianModel, from_pcd, inverse_sigmoid
from omnigs_tpu.ops.knn import mean_sq_knn_dist


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = np.asarray(mean_sq_knn_dist(jnp.asarray(pts), chunk=64))
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_from_pcd():
    pts = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    d2 = mean_sq_knn_dist(pts)
    m = from_pcd(pts, cols, capacity=8, mean_sq_nn_dist=d2)
    assert int(m.num_active) == 3
    assert m.capacity == 8
    np.testing.assert_allclose(m.get_opacity()[:3], 0.1, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m.get_scaling()[0]),
        np.sqrt(np.maximum(np.asarray(d2)[0], 1e-7)),
        rtol=1e-5,
    )
    # inactive slots are inert
    assert not bool(m.active[3:].any())


def test_adam_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    steps = 7
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(steps)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)
    for g in grads:
        tp.grad = torch.from_numpy(g)
        topt.step()

    names = O.PARAM_NAMES
    params = {n: jnp.zeros((5, 1)) for n in names}
    params["xyz"] = jnp.asarray(p0)
    state = O.init_adam(params)
    active = jnp.ones((5,), bool)
    for g in grads:
        gd = {n: jnp.zeros((5, 1)) for n in names}
        gd["xyz"] = jnp.asarray(g)
        lrs = {n: jnp.asarray(1e-2) for n in names}
        params, state = O.adam_step(params, gd, state, lrs, active)
    np.testing.assert_allclose(
        np.asarray(params["xyz"]), tp.detach().numpy(), rtol=5e-4, atol=1e-5
    )


def test_expon_lr_schedule():
    # C++ formula check (`gaussian_model.cpp:1140-1153`)
    lr0, lr1, steps = 1.6e-4, 1.6e-6, 30000
    for step in [0, 1, 15000, 30000, 40000]:
        t = min(max(step / steps, 0.0), 1.0)
        want = np.exp(np.log(lr0) * (1 - t) + np.log(lr1) * t)
        got = float(O.expon_lr(step, lr0, lr1, 0, 0.01, steps))
        np.testing.assert_allclose(got, want, rtol=1e-5)  # f32 vs f64


def _mini_model():
    pts = jnp.array([[2.0, 0, 0], [0, 2.0, 0], [0, 0, 2.0], [1.0, 1.0, 0]])
    cols = jnp.full((4, 3), 0.5)
    m = from_pcd(pts, cols, capacity=16, mean_sq_nn_dist=mean_sq_knn_dist(pts))
    return m


def test_densify_clone_and_split():
    m = _mini_model()
    # gaussian 0: high grad + small scale → clone; gaussian 1: high grad +
    # big scale → split; others idle
    m = m.replace(
        xyz_gradient_accum=jnp.zeros(16).at[0].set(1.0).at[1].set(1.0),
        denom=jnp.zeros(16).at[:4].set(1.0),
        scaling=m.scaling.at[1].set(jnp.log(5.0)),
    )
    st = O.init_adam(m.params())
    st = st.replace(mu={**st.mu, "xyz": st.mu["xyz"] + 7.0})  # sentinel moments
    extent = 1.0
    m2, st2, stats = D.densify_and_prune(
        m,
        st,
        jax.random.PRNGKey(0),
        max_grad=2e-4,
        min_opacity=0.005,
        extent=extent,
        max_screen_size=20,
        percent_dense=3.0,  # pd·extent = 3.0: g0 (scale≈2.45) small, g1 (5) big
        prune_by_extent=False,
        iteration=100,
    )
    assert int(stats.num_cloned) == 1
    assert int(stats.num_split) == 1
    assert int(stats.num_dropped) == 0
    # active count: 4 + 1 clone + 2 children − 1 split parent = 6
    assert int(m2.num_active) == 6
    # split parent deactivated
    assert not bool(m2.active[1])
    # clone is an exact copy of gaussian 0 placed in a free slot
    clone_slots = np.where(np.asarray(m2.active) & (np.arange(16) >= 4))[0]
    clone_xyz = np.asarray(m2.xyz[clone_slots])
    assert any(np.allclose(clone_xyz[i], [2.0, 0, 0]) for i in range(3))
    # children scale = parent/1.6
    child = [
        s
        for s in clone_slots
        if np.allclose(
            np.asarray(m2.get_scaling()[s])[0], 5.0 / 1.6, rtol=1e-5
        )
    ]
    assert len(child) == 2
    # moments zeroed at new slots, preserved at old
    assert float(st2.mu["xyz"][clone_slots].sum()) == 0.0
    assert float(st2.mu["xyz"][0].sum()) == 3 * 7.0
    # stats reset
    assert float(m2.xyz_gradient_accum.sum()) == 0.0
    assert int(m2.exist_since_iter[clone_slots[0]]) == 100


def test_densify_prune_low_opacity():
    m = _mini_model()
    m = m.replace(opacity=m.opacity.at[2].set(inverse_sigmoid(jnp.asarray(0.001))))
    st = O.init_adam(m.params())
    m2, _, stats = D.densify_and_prune(
        m,
        st,
        jax.random.PRNGKey(0),
        max_grad=2e-4,
        min_opacity=0.005,
        extent=1.0,
        max_screen_size=0,
        percent_dense=0.01,
        prune_by_extent=False,
        iteration=1,
    )
    assert int(stats.num_pruned) == 1
    assert not bool(m2.active[2])
    assert int(m2.num_active) == 3


def test_densify_capacity_exhaustion_reported():
    m = _mini_model()  # capacity 16, 4 active
    # every gaussian wants to clone AND the capacity is made tiny
    m = jax.tree_util.tree_map(lambda x: x[:5], m)
    m = m.replace(
        xyz_gradient_accum=jnp.ones(5),
        denom=jnp.ones(5),
    )
    st = O.init_adam(m.params())
    m2, _, stats = D.densify_and_prune(
        m,
        st,
        jax.random.PRNGKey(0),
        max_grad=2e-4,
        min_opacity=0.005,
        extent=1e9,  # everything "small" → all clones
        max_screen_size=0,
        percent_dense=1.0,
        prune_by_extent=False,
        iteration=1,
    )
    assert int(stats.num_dropped) == 3  # 4 clones, 1 free slot
    assert int(m2.num_active) == 5


def test_reset_opacity():
    m = _mini_model()
    m = m.replace(opacity=m.opacity.at[:4].set(inverse_sigmoid(jnp.asarray(0.9))))
    st = O.init_adam(m.params())
    st = st.replace(mu={**st.mu, "opacity": st.mu["opacity"] + 3.0})
    m2, st2 = D.reset_opacity(m, st)
    np.testing.assert_allclose(np.asarray(m2.get_opacity()[:4]), 0.01, rtol=1e-4)
    assert float(st2.mu["opacity"].sum()) == 0.0
    assert float(st2.mu["xyz"].sum()) == float(st.mu["xyz"].sum())


def test_add_densification_stats():
    m = _mini_model()
    ndc = jnp.zeros((16, 2)).at[0].set(jnp.array([3.0, 4.0]))
    radii = jnp.zeros(16).at[0].set(10.0).at[1].set(2.0)
    m2 = D.add_densification_stats(m, ndc, radii)
    np.testing.assert_allclose(float(m2.xyz_gradient_accum[0]), 5.0)
    np.testing.assert_allclose(float(m2.denom[0]), 1.0)
    np.testing.assert_allclose(float(m2.denom[2]), 0.0)
    np.testing.assert_allclose(float(m2.max_radii2d[0]), 10.0)
