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


# -- dependency-free TensorBoard event writer --------------------------------

_CRC_TABLE = []


def _crc32c(data: bytes) -> int:
    """CRC32-Castagnoli (TFRecord checksums; zlib.crc32 is the wrong poly)."""
    if not _CRC_TABLE:
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            _CRC_TABLE.append(c)
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            return out


def _pb_bytes(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _pb_double(field: int, v: float) -> bytes:
    return _varint(field << 3 | 1) + struct.pack("<d", v)


def _pb_float(field: int, v: float) -> bytes:
    return _varint(field << 3 | 5) + struct.pack("<f", v)


def _pb_int(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


def _tf_event(wall_time: float, step: int = 0, file_version: str = None,
              scalars: Dict[str, float] = None) -> bytes:
    """Encode a tensorboard Event proto (event.proto: wall_time=1 double,
    step=2 int64, file_version=3 string, summary=5; Summary.Value:
    tag=1 string, simple_value=2 float)."""
    msg = _pb_double(1, wall_time)
    if step:
        msg += _pb_int(2, step)
    if file_version is not None:
        msg += _pb_bytes(3, file_version.encode())
    if scalars:
        summary = b"".join(
            _pb_bytes(1, _pb_bytes(1, tag.encode()) + _pb_float(2, float(v)))
            for tag, v in scalars.items()
        )
        msg += _pb_bytes(5, summary)
    return msg


class TensorBoardLogger:
    """Writes real tfevents files without tensorflow/tensorboardX: Event
    protos hand-encoded into TFRecord framing (length + masked-CRC32C),
    readable by stock TensorBoard. Reference surface:
    configs/logger/tensorboard.yaml (lightning.TensorBoardLogger)."""

    def __init__(self, save_dir: str, name: str = "tensorboard"):
        self.dir = os.path.join(save_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        fname = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self.path = os.path.join(self.dir, fname)
        self._write(_tf_event(time.time(), file_version="brain.Event:2"))

    def _write(self, record: bytes) -> None:
        header = struct.pack("<Q", len(record))
        with open(self.path, "ab") as f:
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(record)
            f.write(struct.pack("<I", _masked_crc(record)))

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        scalars = {k: float(v) for k, v in metrics.items()}
        self._write(_tf_event(time.time(), step=int(step), scalars=scalars))


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


class _WandbLogger:
    """Thin wandb scalar sink (reference configs/logger/wandb.yaml); only
    constructed when wandb imports."""

    def __init__(self, cfg: Dict[str, Any]):
        import wandb

        self.run = wandb.init(
            project=cfg.get("project", "gennerf_tpu"),
            name=cfg.get("name"), dir=cfg.get("save_dir"),
            mode=cfg.get("mode", "offline"),
        )

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        self.run.log({k: float(v) for k, v in metrics.items()}, step=step)


class MetricsLogger:
    """Bundles the configured scalar loggers + the local artifact sink
    (the reference's logger list with a .local attribute)."""

    def __init__(self, save_dir: str, cfg: Optional[Dict[str, Any]] = None):
        cfg = cfg or {}
        self.scalar_loggers = []
        if "csv" in cfg:
            self.scalar_loggers.append(CSVLogger(cfg["csv"].get("save_dir", save_dir)))
        if "tensorboard" in cfg:
            self.scalar_loggers.append(
                TensorBoardLogger(cfg["tensorboard"].get("save_dir", save_dir))
            )
        if "wandb" in cfg:  # optional external backend (absent in this env)
            try:
                import wandb  # noqa: F401

                self.scalar_loggers.append(_WandbLogger(cfg["wandb"]))
            except ImportError:
                get_logger().warning("wandb not installed; falling back to CSV")
                self.scalar_loggers.append(CSVLogger(save_dir))
        if not self.scalar_loggers:
            self.scalar_loggers.append(CSVLogger(save_dir))
        local_cfg = cfg.get("local", {})
        self.local = LocalWriter(
            local_cfg.get("save_dir", save_dir), mute=local_cfg.get("mute_local", False)
        )

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        # rank-0-only file writes under the multi-process runtime (the
        # metrics are jit-global and identical on every process; N
        # processes appending the same rows would duplicate them)
        try:
            import jax

            if jax.process_index() != 0:
                return
        except Exception:
            pass
        for lg in self.scalar_loggers:
            lg.log_metrics(metrics, step)
