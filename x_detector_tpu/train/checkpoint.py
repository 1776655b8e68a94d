"""Orbax checkpointing: save/restore TrainState pytrees (+ data iter state).

Replaces ``tf.train.Saver`` keep-N periodic checkpointing and
MonitoredTrainingSession auto-restore (SURVEY.md §5): async Orbax saves every
N steps; on restart, the latest step restores params, optimizer state, batch
stats, and the data-iterator position so training resumes deterministically.
"""

from __future__ import annotations

import os
import warnings
from typing import Optional

import orbax.checkpoint as ocp

from x_detector_tpu.train.train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self._dir = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )

    def _meta_path(self, step: int) -> str:
        return os.path.join(self._dir, f"meta-{step}.json")

    def _ckpt_has_ema(self, step: int, default: bool) -> bool:
        """Whether the checkpoint at ``step`` carries an EMA shadow.

        New checkpoints are self-describing: ``save()`` writes a
        ``meta-{step}.json`` sidecar we fully control. Pre-sidecar
        checkpoints fall back to sniffing Orbax's private ``_METADATA``
        manifest (``_ckpt_state_keys``), and if that too is unreadable,
        to ``default`` (assume the checkpoint matches the state).
        """
        import json
        try:
            with open(self._meta_path(step)) as f:
                return bool(json.load(f)["has_ema"])
        except Exception:
            pass
        keys = self._ckpt_state_keys(step)      # legacy fallback
        return default if keys is None else ("ema_params" in keys)

    def _ckpt_state_keys(self, step: int) -> Optional[set]:
        """LEGACY fallback (pre-sidecar checkpoints only): top-level keys of
        the saved ``state`` dict, or None if unknown.

        The step's ``_METADATA`` tree manifest on disk is tried first (works
        from any process); ``item_metadata`` — which resolves only on a
        manager that has saved in-process — is the fallback.
        """
        import ast
        import json
        path = os.path.join(self._dir, str(step), "default", "_METADATA")
        try:
            with open(path) as f:
                tree = json.load(f)["tree_metadata"]
            keys = set()
            for k in tree:
                t = ast.literal_eval(k)
                if len(t) >= 2 and t[0] == "state":
                    keys.add(t[1])
            if keys:
                return keys
        except Exception:
            pass
        try:
            meta = self._mgr.item_metadata(step)
            if meta is not None:
                return set(meta["state"].keys())
        except Exception:
            pass
        return None

    def save(self, step: int, state: TrainState,
             data_state: Optional[dict] = None) -> None:
        # data_state is always present in the payload so restore()'s
        # template matches regardless of how save() was called.
        payload = {"state": _strip_tx(state),
                   "data_state": data_state or {"position": 0}}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        # Self-describing sidecar (our file, our format): restore() reads
        # this instead of parsing Orbax's private on-disk manifest.  Written
        # synchronously — it is tiny — even though the payload save is async;
        # an orphan sidecar from a crashed save is ignored (restore() only
        # looks up steps the manager reports).  Process 0 only (the dir is
        # shared in multi-process training) and written via temp-file +
        # os.replace so a crash can never leave a torn/partial sidecar.
        import jax
        import json
        if jax.process_index() != 0:
            return
        tmp = self._meta_path(step) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"has_ema": state.ema_params is not None}, f)
        os.replace(tmp, self._meta_path(step))
        live = set(self._mgr.all_steps()) | {step}
        for name in os.listdir(self._dir):
            # also sweep orphan ".json.tmp" files a crash between the
            # write and the os.replace above can leave behind
            if name.startswith("meta-") and name.endswith(".json.tmp"):
                stem, keep_suffix = name[:-4], False
            elif name.startswith("meta-") and name.endswith(".json"):
                stem, keep_suffix = name, True
            else:
                continue
            try:
                s = int(stem[5:-5])
            except ValueError:
                continue
            if s not in live or not keep_suffix:
                try:
                    os.remove(os.path.join(self._dir, name))
                except OSError:
                    pass

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> tuple[TrainState, dict]:
        """Restore into ``state``, reconciling EMA config drift.

        A checkpoint saved with an EMA shadow restores cleanly into a state
        created with ``ema_decay=0`` (the shadow is adopted, with a warning
        that it will stay frozen), and a no-EMA checkpoint restores into an
        EMA-enabled state (the shadow re-initializes from the restored
        params) — instead of an Orbax template-mismatch error.
        """
        step = self.latest_step() if step is None else step
        assert step is not None, "no checkpoint to restore"
        template = {"state": _strip_tx(state), "data_state": {"position": 0}}
        state_has_ema = state.ema_params is not None
        # Sidecar first; legacy _METADATA sniff for pre-sidecar checkpoints;
        # if neither resolves, assume the checkpoint matches the state.
        ckpt_has_ema = self._ckpt_has_ema(step, default=state_has_ema)
        if ckpt_has_ema and not state_has_ema:
            template["state"]["ema_params"] = state.params
            warnings.warn(
                "checkpoint carries an EMA shadow but this state was created "
                "with ema_decay=0: adopting the shadow (it will NOT update "
                "if training continues)")
        elif state_has_ema and not ckpt_has_ema:
            del template["state"]["ema_params"]
            warnings.warn(
                "state expects an EMA shadow but the checkpoint has none: "
                "re-initializing the shadow from the restored params")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        fields = dict(restored["state"])
        if state_has_ema and not ckpt_has_ema:
            fields["ema_params"] = fields["params"]
        new = state.replace(**fields)
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
