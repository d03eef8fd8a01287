"""SH evaluation tests against independently-written real SH basis values."""

import jax
import jax.numpy as jnp
import numpy as np

from omnigs_tpu.ops import sh as sh_ops


def _basis(deg, d):
    """Real SH basis values in the 3DGS ordering, written out independently."""
    x, y, z = d
    out = [0.28209479177387814]
    if deg > 0:
        out += [
            -0.4886025119029199 * y,
            0.4886025119029199 * z,
            -0.4886025119029199 * x,
        ]
    if deg > 1:
        out += [
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.31539156525252005 * (2 * z * z - x * x - y * y),
            -1.0925484305920792 * x * z,
            0.5462742152960396 * (x * x - y * y),
        ]
    if deg > 2:
        out += [
            -0.5900435899266435 * y * (3 * x * x - y * y),
            2.890611442640554 * x * y * z,
            -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
            0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
            -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
            1.445305721320277 * z * (x * x - y * y),
            -0.5900435899266435 * x * (x * x - 3 * y * y),
        ]
    return np.array(out)


def test_eval_sh_matches_basis():
    rng = np.random.default_rng(0)
    for deg in range(4):
        m = sh_ops.num_sh_coeffs(deg)
        coeffs = rng.normal(size=(5, 16, 3)).astype(np.float32)
        dirs = rng.normal(size=(5, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        got = sh_ops.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs))
        for i in range(5):
            want = _basis(deg, dirs[i]) @ coeffs[i, :m]
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)


def test_sh_to_rgb_clamps_and_grads():
    coeffs = jnp.zeros((2, 16, 3)).at[0, 0, :].set(-10.0)  # strongly negative
    means = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    campos = jnp.zeros(3)
    rgb = sh_ops.sh_to_rgb(3, coeffs, means, campos)
    np.testing.assert_allclose(rgb[0], 0.0)  # clamped at zero
    np.testing.assert_allclose(rgb[1], 0.5)  # zero coeffs → +0.5 offset

    # clamped channel gets zero gradient (PyTorch clamp rule)
    g = jax.grad(lambda c: sh_ops.sh_to_rgb(3, c, means, campos).sum())(coeffs)
    assert float(jnp.abs(g[0]).sum()) == 0.0
    assert float(jnp.abs(g[1]).sum()) > 0.0


def test_rgb2sh_roundtrip():
    rgb = jnp.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(sh_ops.sh2rgb(sh_ops.rgb2sh(rgb)), rgb, rtol=1e-6)
