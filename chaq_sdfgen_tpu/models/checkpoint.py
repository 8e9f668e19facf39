"""Checkpoint / resume for soft-model training state (SURVEY.md §5: the
reference has no persistent state; the training path gets real
checkpointing via orbax) plus .npy intermediate-grid dumps for debugging."""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _treedef_sidecar(path: str) -> str:
    return path + ".treedefs.pkl"


def save_train_state(path: str, params: Any, opt_state: Any, step: int) -> None:
    """Orbax-checkpoint the (params, opt_state, step) pytree. A sidecar
    records the tree structure + leaf specs so a later restore needs no
    live template (optax opt states are NamedTuples, which orbax alone
    deserializes as plain dicts)."""
    import pickle

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state = {"params": params, "opt_state": opt_state, "step": np.int64(step)}
    ckptr.save(path, state, force=True)
    leaves, treedef = jax.tree.flatten(state)
    with open(_treedef_sidecar(path), "wb") as f:
        pickle.dump(
            {
                "treedef": treedef,
                "specs": [(np.shape(l), np.asarray(l).dtype.str) for l in leaves],
            },
            f,
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
    elif os.path.exists(_treedef_sidecar(path)):
        # rebuild the typed template (incl. optax NamedTuple states) from
        # the recorded structure, then restore against it
        import pickle

        with open(_treedef_sidecar(path), "rb") as f:
            meta = pickle.load(f)
        placeholders = [
            np.zeros(shape, dtype=np.dtype(dt)) for shape, dt in meta["specs"]
        ]
        template = jax.tree.unflatten(meta["treedef"], placeholders)
        restored = ckptr.restore(path, item=template)
    else:
        # legacy checkpoint without a sidecar: raw orbax tree (NamedTuple
        # opt states come back as dicts — fine for inspection, pass
        # like_* for a drop-in train state)
        restored = ckptr.restore(path)
        if not isinstance(restored, dict) or not {
            "params", "opt_state", "step"
        } <= set(restored):
            raise ValueError(
                f"checkpoint at {path} is not a train state "
                f"(keys: {sorted(restored) if isinstance(restored, dict) else type(restored)})"
            )
    import jax.numpy as jnp

    params = jax.tree.map(jnp.asarray, restored["params"])
    opt_state = jax.tree.map(jnp.asarray, restored["opt_state"])
    return params, opt_state, int(restored["step"])


def dump_grid(path: str, name: str, arr) -> str:
    """Save an intermediate field (indicator, row distances, EDT, signed
    values) as .npy for offline inspection."""
    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, f"{name}.npy")
    np.save(fp, np.asarray(arr))
    return fp
