"""Checkpointing (Orbax): params + opt_state + batch_stats + step.

The reference saves h5 weight files per epoch with epoch/timestamp encoded
in the filename and never checkpoints optimizer state (model.py:2245-2281,
SURVEY.md §5). Here: full training state via Orbax with step-numbered
directories, `find_last`-equivalent latest-step lookup, and resume.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(ckpt_dir, max_to_keep=5):
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir, state, step=None, max_to_keep=5):
    """Save TrainState (pytree fields only) at `step`."""
    mgr = _manager(ckpt_dir, max_to_keep)
    step = int(step if step is not None else state.step)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": np.asarray(state.step),
    }
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    return step


def latest_step(ckpt_dir):
    """find_last() equivalent (model.py:2073-2100)."""
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    return mgr.latest_step()


def restore_checkpoint(ckpt_dir, state, step=None):
    """Restore into an existing TrainState template; returns the new state."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        return state
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": np.asarray(state.step),
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    return state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"],
        step=jax.numpy.asarray(restored["step"]))
