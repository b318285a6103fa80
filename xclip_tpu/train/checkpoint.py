"""Orbax checkpoint/resume for the train state.

The reference has no checkpointing (users torch.save the module; SURVEY §5).
Here the param tree structure is stable by construction — the extra latent
heads are always allocated (model.py init, matching x_clip.py:585-586) — so
checkpoints restore across feature-flag changes the same way the reference's
state_dicts do.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state, *, force: bool = True) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)


def restore_checkpoint(path: str, target) -> Any:
    """Restore into the structure of `target` (e.g. a freshly-initialized
    TrainState) so shardings and dtypes are preserved."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)
