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
    def __init__(self, directory: str, save_top_k: int = -1, save_last: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        max_to_keep = None if save_top_k == -1 else max(save_top_k, 1)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )
        self.save_last = save_last

    def save(self, epoch: int, state: TrainState, config: Optional[Dict[str, Any]] = None):
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                json.dump(jax.tree.map(_jsonable, config), f, indent=2, default=str)

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def _jsonable(x):
    return x


def load_config(ckpt_dir: str) -> Dict[str, Any]:
    with open(os.path.join(os.path.abspath(ckpt_dir), "config.json")) as f:
        return json.load(f)
