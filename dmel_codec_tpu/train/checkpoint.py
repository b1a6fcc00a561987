"""Orbax checkpointing with latest-checkpoint auto-resume.

Replaces the reference's Lightning ModelCheckpoint + find_lastest_ckpt
mtime scan (utils/utils.py:11-21, train_codec.py:57-62). The codec's frozen
vocoder is naturally excluded: it is not part of CodecTrainState (the
reference strips vocoder keys at save time, codec_lit_modules.py:114-119).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-indexed checkpoints under `directory`, keep-k, auto-resume."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, abstract_state: Any) -> Optional[Any]:
        """Restore the newest checkpoint into the structure of
        `abstract_state` (a matching pytree, e.g. a freshly-initialised
        train state). Returns None when no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(target))

    def restore_latest_fields(self, abstract_state: Any, fields) -> Optional[dict]:
        """Partial restore of selected top-level train-state fields (e.g.
        ('params', 'step') for inference — optimizer-state structure can
        differ between the training and serving configurations)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        item = {
            f: jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, getattr(abstract_state, f)
            )
            for f in fields
        }
        return self._mgr.restore(
            step, args=ocp.args.PyTreeRestore(item=item, partial_restore=True)
        )

    def close(self) -> None:
        self._mgr.close()
