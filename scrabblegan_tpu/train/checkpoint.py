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
    return _save_net(model_dir, "generator", g_params, g_stats, epoch)


def save_recognizer(model_dir: str, r_params: Any, r_stats: Any, epoch: int) -> str:
    """Recognizer-only per-epoch export (parity with data_utils.py:347-348 —
    the reference saves R weights alongside G every epoch). Lets the rFID/CER
    feature extractor be rebuilt from ANY epoch without the full-state
    checkpoint (which only lands every io.ckpt_every epochs)."""
    return _save_net(model_dir, "recognizer", r_params, r_stats, epoch)


def _save_net(model_dir: str, name: str, params: Any, stats: Any, epoch: int) -> str:
    path = os.path.abspath(os.path.join(model_dir, name, str(epoch)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "batch_stats": stats}, force=True)
    ckptr.wait_until_finished()
    ckptr.close()
    return path


def load_generator(path: str) -> dict:
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(os.path.abspath(path))
    ckptr.close()
    return variables


# R exports share the {params, batch_stats} layout of G exports
load_recognizer = load_generator


def latest_generator_export(model_dir: str) -> Optional[str]:
    return _latest_export(model_dir, "generator")


def latest_recognizer_export(model_dir: str) -> Optional[str]:
    return _latest_export(model_dir, "recognizer")


def _latest_export(model_dir: str, name: str) -> Optional[str]:
    root = os.path.join(model_dir, name)
    if not os.path.isdir(root):
        return None
    epochs = [int(d) for d in os.listdir(root) if d.isdigit()]
    if not epochs:
        return None
    return os.path.join(root, str(max(epochs)))
