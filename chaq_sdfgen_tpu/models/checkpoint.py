"""Checkpoint / resume for soft-model training state (SURVEY.md §5: the
reference has no persistent state; the training path gets real
checkpointing via orbax) plus .npy intermediate-grid dumps for debugging."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_train_state(path: str, params: Any, opt_state: Any, step: int) -> None:
    """Orbax-checkpoint the (params, opt_state, step) pytree."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        path,
        {"params": params, "opt_state": opt_state, "step": np.int64(step)},
        force=True,
    )


def restore_train_state(path: str, like_params: Any = None, like_opt: Any = None):
    """Restore (params, opt_state, step). ``like_*`` give structure/dtype
    templates for exact pytree restoration when available."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if like_params is not None and like_opt is not None:
        template = {"params": like_params, "opt_state": like_opt, "step": np.int64(0)}
        restored = ckptr.restore(path, item=template)
    else:
        restored = ckptr.restore(path)
    return restored["params"], restored["opt_state"], int(restored["step"])


def dump_grid(path: str, name: str, arr) -> str:
    """Save an intermediate field (indicator, row distances, EDT, signed
    values) as .npy for offline inspection."""
    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, f"{name}.npy")
    np.save(fp, np.asarray(arr))
    return fp
