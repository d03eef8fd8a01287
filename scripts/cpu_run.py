#!/usr/bin/env python
"""Run a repo script on the CPU backend regardless of the boot hook.

This environment's interpreter boot hook registers the TPU PJRT plugin and
sets `jax_platforms=axon,cpu`, overriding the JAX_PLATFORMS env var; scripts
that must run host-side (dataset synthesis, smoke checks while the chip is
busy) go through this launcher, which wins by updating the config before any
backend initialization.

Usage: python scripts/cpu_run.py SCRIPT [args...]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import runpy

sys.argv = sys.argv[1:]
runpy.run_path(sys.argv[0], run_name="__main__")
