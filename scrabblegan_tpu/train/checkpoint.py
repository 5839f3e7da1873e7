"""Orbax checkpoint/resume of the FULL train state.

Upgrades the reference's vestigial tf.train.Checkpoint — constructed but never
saved or restored (main.py:93-102; SURVEY.md component 22/defect #6) — to real
fault tolerance: all four networks' params, BN/SN statistics, all four optimizer
states, and the step counter are saved atomically per epoch and restored on
start. A generator-only export (save_generator) mirrors the reference's
per-epoch `generator.save_weights` consumed by run_inference.py.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from scrabblegan_tpu.train.state import TrainState


def _mgr(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_state(ckpt_dir: str, state: TrainState, step: int) -> None:
    mgr = _mgr(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_state(ckpt_dir: str, template: TrainState) -> Tuple[Optional[TrainState], int]:
    """Restore the latest checkpoint into the template's structure.

    Returns (state, step) or (None, 0) when no checkpoint exists."""
    if not os.path.isdir(ckpt_dir):
        return None, 0
    mgr = _mgr(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None, 0
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    mgr.close()
    return state, int(step)


def save_generator(model_dir: str, g_params: Any, g_stats: Any, epoch: int) -> str:
    """Generator-only export for inference (parity with data_utils.py:346 +
    run_inference.py's saved-model consumption)."""
    path = os.path.abspath(os.path.join(model_dir, "generator", str(epoch)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": g_params, "batch_stats": g_stats}, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    return path


def load_generator(path: str) -> dict:
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.abspath(path))
    ckptr.close()
    return variables


def latest_generator_export(model_dir: str) -> Optional[str]:
    root = os.path.join(model_dir, "generator")
    if not os.path.isdir(root):
        return None
    epochs = [int(d) for d in os.listdir(root) if d.isdigit()]
    if not epochs:
        return None
    return os.path.join(root, str(max(epochs)))
