"""Driver-contract regression tests: `entry()` must jit-compile single-chip
and `dryrun_multichip(n)` must compile + run the FULL sharded training step
on an n-device mesh (the driver validates both; conftest forces an 8-device
CPU host platform)."""

import jax
import jax.numpy as jnp


def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (3, 128, 256)
    assert bool(jnp.isfinite(img).all())


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
