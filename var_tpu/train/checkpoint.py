"""Orbax checkpointing.

Upgrades the reference's bare state_dict saves (reference:
VAR/pretext_VAR.py:75-80, RL.py:209-216 — weights only, no optimizer/step,
so "resume" was fine-tune-from-weights) to full training-state checkpoints:
params + optimizer state + step + PRNG key, saved atomically.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(path: str, state: Any):
    """Save a pytree checkpoint to `path` (a directory)."""
    path = _abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a pytree checkpoint; `target` (optional) provides structure and
    shapes for restoration."""
    path = _abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(f"checkpoint {path!r} not found")
    ckptr = ocp.PyTreeCheckpointer()
    if target is None:
        # Restore every leaf as a plain numpy array instead of replaying
        # the SAVED shardings: a checkpoint written on one backend (e.g.
        # the TPU) must restore on any other (CPU eval/tooling) — the
        # saved device metadata can't resolve there and orbax errors with
        # "sharding ... Got None". Callers device_put as needed.
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        return ckptr.restore(
            path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
    restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(item=target))
    return restored


def latest_checkpoint(save_dir: str) -> Optional[str]:
    """Newest numeric subdirectory of save_dir (checkpoints are saved as
    '<save_dir>/<step>')."""
    save_dir = _abspath(save_dir)
    if not os.path.isdir(save_dir):
        return None
    steps = []
    for name in os.listdir(save_dir):
        full = os.path.join(save_dir, name)
        if os.path.isdir(full):
            try:
                steps.append((int(name), full))
            except ValueError:
                continue
    if not steps:
        return None
    return max(steps)[1]
