"""Checkpoint save/restore (orbax).

Reference behavior (SURVEY §5.4): Lightning ModelCheckpoint saving every
val epoch + last, hyperparameters embedded; resume via ckpt_path. Here:
orbax-checkpoint of the TrainState pytree plus a config snapshot.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    """Orbax-backed checkpoint manager.

    Default parity behavior (reference configs/callbacks/default.yaml:9-14:
    monitor null, save_last, save_top_k -1): every epoch kept. With a
    `monitor` (e.g. 'val_combined') and save_top_k > 0, orbax keeps the
    top-k checkpoints by the monitored metric and `best_epoch()` exposes
    the winner — the analog of Lightning's `best_model_path` that
    `trainer.test` restores (reference src/train.py:101-108)."""

    def __init__(self, directory: str, save_top_k: int = -1, save_last: bool = True,
                 monitor: Optional[str] = None, mode: str = "min"):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        max_to_keep = None if save_top_k == -1 else max(save_top_k, 1)
        self.monitor = monitor
        if mode not in ("min", "max"):
            raise ValueError(f"monitor mode must be 'min' or 'max', got {mode!r}")
        self.mode = mode
        opts: Dict[str, Any] = dict(max_to_keep=max_to_keep, create=True)
        if monitor:
            opts.update(
                best_fn=lambda metrics: float(metrics[monitor]),
                best_mode=mode,
                # epochs without validation save no metrics; keep them out
                # of the top-k ranking but don't crash on them
                keep_checkpoints_without_metrics=False,
            )
        self._mgr = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(**opts)
        )
        self.save_last = save_last

    def save(self, epoch: int, state: TrainState,
             config: Optional[Dict[str, Any]] = None,
             metrics: Optional[Dict[str, float]] = None,
             wait: bool = False):
        """Save asynchronously by default: orbax serializes in a background
        thread, so the epoch-end save overlaps the next epoch's steps
        (orbax itself blocks a new save until the previous one lands).
        Every read path (`restore*`, `latest_epoch`, `best_epoch`) and
        `close()` barrier on in-flight saves; pass wait=True where the
        process may exit right after (preemption)."""
        kwargs = {}
        if self.monitor:
            if metrics is not None and self.monitor in metrics:
                kwargs["metrics"] = {self.monitor: float(metrics[self.monitor])}
            else:
                # rank unmonitored epochs last so they never displace a
                # measured checkpoint from the top-k
                worst = float("inf") if self.mode == "min" else float("-inf")
                kwargs["metrics"] = {self.monitor: worst}
        self._mgr.save(epoch, args=ocp.args.StandardSave(state), **kwargs)
        if wait:
            self._mgr.wait_until_finished()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(jax.tree.map(_jsonable, config), f, indent=2, default=str)

    def wait(self):
        """Block until all in-flight async saves are durable."""
        self._mgr.wait_until_finished()

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def restore_best(self, state_template: TrainState) -> TrainState:
        """Restore the best monitored checkpoint (falls back to latest when
        no monitor is configured or nothing was ranked)."""
        return self.restore(state_template, self.best_epoch())

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def best_epoch(self) -> Optional[int]:
        """Epoch of the best monitored metric; None without a monitor (the
        caller then uses the latest, which is the reference's behavior when
        ModelCheckpoint has monitor: null)."""
        if not self.monitor:
            return None
        self._mgr.wait_until_finished()
        return self._mgr.best_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def _jsonable(x):
    return x


def load_config(ckpt_dir: str) -> Dict[str, Any]:
    with open(os.path.join(os.path.abspath(ckpt_dir), "config.json")) as f:
        return json.load(f)
