"""Orbax checkpointing with latest-checkpoint auto-resume.

Replaces the reference's Lightning ModelCheckpoint + find_lastest_ckpt
mtime scan (utils/utils.py:11-21, train_codec.py:57-62). The codec's frozen
vocoder is naturally excluded: it is not part of CodecTrainState (the
reference strips vocoder keys at save time, codec_lit_modules.py:114-119).

Retention matches the reference's ModelCheckpoint(monitor=..., save_top_k)
(config/codec/dMel_used.yaml:135-144 monitors val_loss, lm_config.yaml:146-156
monitors val/audio_loss): pass `best_metric`/`best_mode` and save() with a
metrics dict, and orbax keeps the top-k by that metric instead of the k
newest. Without `best_metric` the manager keeps the k newest (the
save_last/auto-resume behavior).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-indexed checkpoints under `directory`, keep-k, auto-resume."""

    def __init__(
        self,
        directory: str,
        max_to_keep: int = 2,
        best_metric: Optional[str] = None,
        best_mode: str = "min",
    ):
        self.directory = os.path.abspath(directory)
        self.best_metric = best_metric
        self.best_mode = best_mode
        os.makedirs(self.directory, exist_ok=True)
        options: dict[str, Any] = dict(max_to_keep=max_to_keep, create=True)
        if best_metric is not None:
            options.update(
                best_fn=lambda metrics: float(metrics[best_metric]),
                best_mode=best_mode,
            )
        self._mgr = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(**options)
        )

    def save(
        self, step: int, state: Any, metrics: Optional[dict] = None
    ) -> None:
        """`metrics` (plain floats) ranks this checkpoint when the manager
        was built with `best_metric`. A best-ranked manager treats a save
        with no metrics as worst-ranked (it is still written, and still
        resumable via latest_step until evicted)."""
        if self.best_metric is not None and metrics is None:
            worst = float("inf") if self.best_mode == "min" else float("-inf")
            metrics = {self.best_metric: worst}
        elif self.best_metric is None:
            metrics = None
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )

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
