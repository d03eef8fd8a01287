#!/usr/bin/env python
"""Generate the committed golden parity arrays from the M0 oracle (CPU).

Pins the oracle's `simple_cloud` (the reference smoke scene,
`/root/reference/examples/simple_cloud.cpp:126-230`) and one seeded random
cloud: forward image, final_T, and the gradients of a fixed weighted-sum
loss w.r.t. all five differentiable inputs. `tests/test_goldens.py` checks
the XLA and Pallas backends against these files, and
`scripts/check_jit_parity.py` re-checks them compiled on the real chip — so
a semantics regression can never silently move the target (BASELINE
config 1; VERDICT r1 item 7).

Regenerate ONLY for an intentional semantics change:
  python scripts/make_goldens.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def oracle_outputs(params, camera, viewmatrix, campos, sh_degree=3,
                   quirk_grads=False):
    """Forward from the oracle; gradients from oracle autodiff, or — with
    ``quirk_grads`` — from the XLA tile rasterizer. The latter is needed for
    scenes where α hits the 0.99 clamp: the reference backward ignores the
    clamp (`backward.cu:821`), which every production backend reproduces but
    plain autodiff through the oracle's `min` does not (simple_cloud's
    sigmoid(5) ≈ 0.993 opacity activates it)."""
    import jax
    import jax.numpy as jnp

    from omnigs_tpu.ops.oracle import render_oracle
    from omnigs_tpu.ops.preprocess import preprocess

    bg = jnp.array([0.1, 0.2, 0.3])

    def fwd(means3d, scales, quats, opacities, shs):
        prep = preprocess(
            means3d, scales, quats, opacities, shs,
            camera, viewmatrix, campos, sh_degree,
        )
        img, final_T, n_contrib = render_oracle(prep, camera, bg)
        return img, final_T, n_contrib

    args = (
        params["means3d"], params["scales"], params["quats"],
        params["opacities"], params["shs"],
    )
    img, final_T, n_contrib = fwd(*args)

    key = jax.random.PRNGKey(42)
    w = jax.random.normal(key, img.shape)

    if quirk_grads:
        from omnigs_tpu.ops.rasterize import RasterConfig, rasterize

        cfg = RasterConfig(max_instances=1 << 15, tile_cap=256, chunk=32)

        def loss(*a):
            res = rasterize(
                *a, camera=camera, viewmatrix=viewmatrix, campos=campos,
                bg=bg, sh_degree=sh_degree, config=cfg,
            )
            return jnp.sum(res.image * w)
    else:

        def loss(*a):
            return jnp.sum(fwd(*a)[0] * w)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
    return dict(
        image=img,
        final_T=final_T,
        loss_w=w,
        g_means3d=grads[0],
        g_scales=grads[1],
        g_quats=grads[2],
        g_opacities=grads[3],
        g_shs=grads[4],
    )


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from helpers import random_cloud, simple_cloud

    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)

    params, camera, vm, campos = simple_cloud(width=512, height=256)
    out = oracle_outputs(params, camera, vm, campos, sh_degree=0,
                         quirk_grads=True)
    out.update({f"in_{k}": v for k, v in params.items()})
    np.savez_compressed(
        GOLDEN_DIR / "simple_cloud.npz",
        **{k: np.asarray(v) for k, v in out.items()},
    )
    print(f"wrote {GOLDEN_DIR/'simple_cloud.npz'}")

    params2 = random_cloud(jax.random.PRNGKey(3), 192)
    _, camera2, vm2, campos2 = simple_cloud(width=256, height=128)
    out2 = oracle_outputs(params2, camera2, vm2, campos2, sh_degree=3)
    out2.update({f"in_{k}": v for k, v in params2.items()})
    np.savez_compressed(
        GOLDEN_DIR / "random_cloud.npz",
        **{k: np.asarray(v) for k, v in out2.items()},
    )
    print(f"wrote {GOLDEN_DIR/'random_cloud.npz'}")


if __name__ == "__main__":
    main()
