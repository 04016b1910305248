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
            )
        self._mgr = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(**opts)
        )
        self.save_last = save_last
        # With a monitor, the ranked manager garbage-collects by metric —
        # which would delete exactly the checkpoints resume depends on (the
        # newest epoch when it ranks outside the top-k, and unvalidated /
        # preemption saves that carry no metric). A separate single-slot
        # "last" manager holds the newest state unconditionally (the analog
        # of Lightning's last.ckpt, reference callbacks/default.yaml
        # save_last). Without a monitor, orbax retention is most-recent-k,
        # so the latest ranked checkpoint is always retained and no
        # separate slot is needed.
        self._last_mgr: Optional[ocp.CheckpointManager] = None
        # open the "last" slot when this run WRITES it (monitor set) and
        # ALSO when a previous run left one on disk: the resume paths
        # (scripts/train.py / loop.fit ckpt_path=...) construct a
        # monitor-less manager, and a monitored run that never validated
        # (or was preempted before its first val) has its ONLY durable
        # state in last/ — without this, resume raised "no checkpoint"
        # at a directory that visibly contained one
        if monitor or os.path.isdir(os.path.join(self.directory, "last")):
            self._last_mgr = ocp.CheckpointManager(
                os.path.join(self.directory, "last"),
                options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
            )

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
        ranked = (not self.monitor
                  or (metrics is not None and self.monitor in metrics))
        if ranked:
            kwargs = {}
            if self.monitor:
                kwargs["metrics"] = {self.monitor: float(metrics[self.monitor])}
            self._mgr.save(epoch, args=ocp.args.StandardSave(state), **kwargs)
            # mirror into the last-slot so top-k GC of this epoch can never
            # strand resume behind an older checkpoint
            if self._last_mgr is not None and self.save_last:
                self._last_mgr.save(epoch, args=ocp.args.StandardSave(state))
        else:
            # unvalidated epoch (or preemption save) under a monitor: never
            # enters the ranking — it lands in the last-slot only, so it can
            # neither displace a measured checkpoint nor be deleted by the
            # ranked GC before the process exits
            assert self._last_mgr is not None
            self._last_mgr.save(epoch, args=ocp.args.StandardSave(state))
        if wait:
            self.wait()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(jax.tree.map(_jsonable, config), f, indent=2, default=str)

    def wait(self):
        """Block until all in-flight async saves are durable."""
        self._mgr.wait_until_finished()
        if self._last_mgr is not None:
            self._last_mgr.wait_until_finished()

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        self.wait()
        step = step if step is not None else self.latest_epoch()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if step in self._mgr.all_steps():
            return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        if self._last_mgr is not None and step in self._last_mgr.all_steps():
            return self._last_mgr.restore(
                step, args=ocp.args.StandardRestore(state_template))
        raise FileNotFoundError(f"no checkpoint for epoch {step} in {self.directory}")

    def restore_best(self, state_template: TrainState) -> TrainState:
        """Restore the best monitored checkpoint (falls back to latest when
        no monitor is configured or nothing was ranked)."""
        return self.restore(state_template, self.best_epoch())

    def latest_epoch(self) -> Optional[int]:
        self.wait()
        candidates = [s for s in (
            self._mgr.latest_step(),
            self._last_mgr.latest_step() if self._last_mgr is not None else None,
        ) if s is not None]
        return max(candidates) if candidates else None

    def best_epoch(self) -> Optional[int]:
        """Epoch of the best monitored metric; None without a monitor (the
        caller then uses the latest, which is the reference's behavior when
        ModelCheckpoint has monitor: null) and None when nothing was ever
        validated (only last-slot saves exist)."""
        if not self.monitor:
            return None
        self._mgr.wait_until_finished()
        return self._mgr.best_step()

    def close(self):
        self.wait()
        self._mgr.close()
        if self._last_mgr is not None:
            self._last_mgr.close()


def _jsonable(x):
    return x


def load_config(ckpt_dir: str) -> Dict[str, Any]:
    with open(os.path.join(os.path.abspath(ckpt_dir), "config.json")) as f:
        return json.load(f)
