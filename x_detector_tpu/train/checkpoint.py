"""Orbax checkpointing: save/restore TrainState pytrees (+ data iter state).

Replaces ``tf.train.Saver`` keep-N periodic checkpointing and
MonitoredTrainingSession auto-restore (SURVEY.md §5): async Orbax saves every
N steps; on restart, the latest step restores params, optimizer state, batch
stats, and the data-iterator position so training resumes deterministically.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from x_detector_tpu.train.train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )

    def save(self, step: int, state: TrainState,
             data_state: Optional[dict] = None) -> None:
        # data_state is always present in the payload so restore()'s
        # template matches regardless of how save() was called.
        payload = {"state": _strip_tx(state),
                   "data_state": data_state or {"position": 0}}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> tuple[TrainState, dict]:
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint to restore"
        template = {"state": _strip_tx(state), "data_state": {"position": 0}}
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        new = state.replace(**restored["state"])
        return new, restored.get("data_state", {})

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def _strip_tx(state: TrainState) -> dict:
    """Serializable view: drop the (non-pytree) optimizer transformation."""
    out = {"step": state.step, "params": state.params,
           "batch_stats": state.batch_stats, "opt_state": state.opt_state}
    if state.ema_params is not None:
        out["ema_params"] = state.ema_params
    return out
