"""Full-state checkpointing (model + optimizer + schedule position).

The reference checkpoints the *model only* via PLY and cannot truly resume —
optimizer moments, the iteration counter, and densification stats are lost
(`/root/reference/src/gaussian_model.cpp:860-976`, SURVEY.md §5). Here the
PLY path is kept for ecosystem interop (io/ply.py) and real resume is added
with orbax: one directory holds the GaussianModel pytree, AdamState, the
iteration counter, and the sampler RNG state.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from omnigs_tpu.model.gaussians import GaussianModel
from omnigs_tpu.model.optimizer import AdamState


def save_checkpoint(
    path: Path,
    model: GaussianModel,
    opt_state: AdamState,
    iteration: int,
    extra: Optional[dict] = None,
) -> None:
    path = Path(path).resolve()
    ckpt = {
        "model": model,
        "opt_state": opt_state,
        "iteration": np.asarray(iteration),
    }
    if extra:
        ckpt["extra"] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, ckpt, force=True)


def load_checkpoint(
    path: Path, capacity: int
) -> Tuple[GaussianModel, AdamState, int, dict]:
    """Restore. `capacity` must match the saved arrays' leading dim."""
    path = Path(path).resolve()
    template_model = GaussianModel.empty(capacity)
    from omnigs_tpu.model.optimizer import init_adam

    template = {
        "model": template_model,
        "opt_state": init_adam(template_model.params()),
        "iteration": np.asarray(0),
    }
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=template)
    extra = restored.get("extra", {}) if isinstance(restored, dict) else {}
    return (
        restored["model"],
        restored["opt_state"],
        int(restored["iteration"]),
        extra,
    )
