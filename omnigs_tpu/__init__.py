"""omnigs_tpu — TPU-native omnidirectional 3D Gaussian Splatting.

A from-scratch JAX/Pallas/pjit framework providing the capabilities of the
OmniGS reference (equirectangular Gaussian splatting; see SURVEY.md): a
differentiable lonlat/pinhole tile rasterizer, the full training stack
(L1+SSIM, grouped Adam, densification), PLY-compatible checkpoints,
360Roam/EgoNeRF dataset loaders, evaluation harness, and multi-chip sharding
over `jax.sharding.Mesh`.

Design pillars (TPU-first, not a CUDA port):
  * static shapes everywhere (fixed Gaussian capacity + validity masks,
    capped per-tile instance budgets) — no host syncs, no reallocs;
  * per-tile alpha compositing expressed as dense matmuls on the MXU,
    gradients reduced with segment_sum (deterministic) instead of atomics;
  * camera model is a pure function pair (project, jacobian), not a class
    fork; custom_vjp wraps the whole rasterize op;
  * multi-device via shard_map over a Mesh (views = data axis, Gaussians =
    tensor axis), XLA collectives over ICI.
"""

__version__ = "0.1.0"

from omnigs_tpu.cameras import Camera, CameraType  # noqa: F401
