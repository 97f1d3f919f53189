"""Full-train-state checkpointing with resume.

The reference only *saves* (whole-module torch pickles + joblib env state,
logx.py:200-270) — there is no resume of optimizer/epoch/RNG; interrupted
runs restart from scratch (SURVEY.md §5). Here the complete RunnerState
pytree (params, both optimizers, env state, layout pool, RNG, counters) is
checkpointed with orbax, so a run resumes bit-exactly where it stopped.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax


def _ckpt_dir(output_dir: str) -> str:
    return os.path.abspath(os.path.join(output_dir, 'checkpoint'))


def save_checkpoint(output_dir: str, state, epoch: int, total_steps: int):
    """Write the full train state + counters. Overwrites the previous one
    (single rolling checkpoint, like the reference's vars.pkl)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(output_dir)
    host = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, 'state'), host, force=True)
    with open(os.path.join(path, 'meta.json'), 'w') as f:
        json.dump({'epoch': epoch, 'total_steps': total_steps}, f)


def has_checkpoint(output_dir: str) -> bool:
    return os.path.exists(os.path.join(_ckpt_dir(output_dir), 'meta.json'))


def restore_checkpoint(output_dir: str, state_like):
    """Restore into the structure of `state_like` (a freshly-initialized
    RunnerState — shapes/dtypes must match). Returns (state, epoch,
    total_steps)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(output_dir)
    host_like = jax.tree_util.tree_map(np.asarray, jax.device_get(state_like))
    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(os.path.join(path, 'state'), item=host_like)
    state = jax.tree_util.tree_map(
        lambda like, x: jax.numpy.asarray(x, dtype=like.dtype)
        if hasattr(like, 'dtype') else x,
        state_like, restored,
    )
    with open(os.path.join(path, 'meta.json')) as f:
        meta = json.load(f)
    return state, meta['epoch'], meta['total_steps']
