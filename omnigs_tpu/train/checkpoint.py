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
    path: Path, capacity: int, mesh=None
) -> Tuple[GaussianModel, AdamState, int, dict]:
    """Restore. `capacity` must match the saved arrays' leading dim.

    With ``mesh``, arrays restore directly INTO the (data, gauss) sharding
    layout (Gaussian axis sharded, Adam count replicated) — each process of
    a multi-host run reads only its own shards; no host materializes the
    full state. Without it, plain host arrays (single-process resume).
    """
    path = Path(path).resolve()
    template_model = GaussianModel.empty(capacity)
    from omnigs_tpu.model.optimizer import init_adam

    template = {
        "model": template_model,
        "opt_state": init_adam(template_model.params()),
        "iteration": np.asarray(0),
    }
    ckptr = ocp.PyTreeCheckpointer()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from omnigs_tpu.parallel.mesh import GAUSS_AXIS

        gshard = NamedSharding(mesh, P(GAUSS_AXIS))
        rshard = NamedSharding(mesh, P())

        def _abs(x, shard):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shard)

        count = _abs(template["opt_state"].count, rshard)
        template = {
            "model": jax.tree_util.tree_map(
                lambda x: _abs(x, gshard), template["model"]
            ),
            "opt_state": jax.tree_util.tree_map(
                lambda x: _abs(x, gshard),
                template["opt_state"].replace(count=None),
            ).replace(count=count),
            "iteration": np.asarray(0),
        }
        restore_args = ocp.checkpoint_utils.construct_restore_args(template)
        restored = ckptr.restore(
            path, item=template, restore_args=restore_args
        )
    else:
        restored = ckptr.restore(path, item=template)
    extra = restored.get("extra", {}) if isinstance(restored, dict) else {}
    return (
        restored["model"],
        restored["opt_state"],
        int(restored["iteration"]),
        extra,
    )
