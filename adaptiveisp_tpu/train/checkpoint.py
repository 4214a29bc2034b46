"""Checkpoint / resume via orbax.

The reference saves {'iter', 'agent_model', 'value_model', 'agent_optimizer',
'value_optimizer'} every 1000 iters (/root/reference/train.py:471-486) but
restores ONLY model weights on resume (train.py:200-204) — the optimizer /
schedule state is silently dropped.  This port keeps the same payload layout
and fixes that gap: `restore` returns the full TrainState including both
optimizer states and the step counter (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from adaptiveisp_tpu.train.step import TrainState


def _manager(ckpt_dir: str, keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                             create=True),
    )


def save(ckpt_dir: str, state: TrainState, step: int,
         keep: int = 5) -> None:
    mgr = _manager(ckpt_dir, keep)
    mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore(ckpt_dir: str, template: TrainState,
            step: Optional[int] = None) -> TrainState:
    """Restore a full TrainState (weights + optimizer states + step)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(
            f"no checkpoint found under {ckpt_dir!r} (empty or missing "
            f"checkpoint directory)")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(template._asdict()))
    mgr.close()
    return TrainState(**restored)


def save_weights_only(path: str, state: TrainState) -> None:
    """Reference-style weights-only artifact for inference handoff
    (the ckpt['agent_model'] consumer, val_adaptiveisp.py:192)."""
    import pickle

    payload = {
        "iter": int(jax.device_get(state.step)),
        "agent_model": jax.device_get(
            {"params": state.agent_params, "batch_stats": state.agent_stats}),
        "value_model": jax.device_get(
            {"params": state.value_params, "batch_stats": state.value_stats}),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_weights_only(path: str):
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)
