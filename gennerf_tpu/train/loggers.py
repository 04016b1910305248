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

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        """hparams.yaml next to metrics.csv (lightning CSVLogger surface)."""
        import yaml

        with open(os.path.join(self.dir, "hparams.yaml"), "w") as f:
            yaml.safe_dump(hparams, f, default_flow_style=False, sort_keys=False)


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


def _pb_enum(field: int, v: int) -> bytes:
    return _varint(field << 3) + _varint(v)


def _tensor_proto(arr: np.ndarray) -> bytes:
    """tensorflow TensorProto (tensor.proto): dtype=1 enum,
    tensor_shape=2 TensorShapeProto, tensor_content=4 bytes.
    TensorShapeProto.Dim: size=1 int64."""
    dtypes = {np.dtype(np.float32): 1, np.dtype(np.int32): 3,
              np.dtype(np.uint8): 4}
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in dtypes:
        arr = arr.astype(np.float32)
    shape = b"".join(_pb_bytes(2, _pb_int(1, int(d))) for d in arr.shape)
    return (
        _pb_enum(1, dtypes[arr.dtype])
        + _pb_bytes(2, shape)
        + _pb_bytes(4, arr.tobytes())
    )


def _summary_value_image(tag: str, png: bytes, h: int, w: int,
                         colorspace: int = 3) -> bytes:
    """Summary.Value{tag=1, image=4 Summary.Image{height=1, width=2,
    colorspace=3, encoded_image_string=4}} (summary.proto)."""
    img = (
        _pb_int(1, int(h)) + _pb_int(2, int(w)) + _pb_int(3, int(colorspace))
        + _pb_bytes(4, png)
    )
    return _pb_bytes(1, _pb_bytes(1, tag.encode()) + _pb_bytes(4, img))


# tensorboard mesh plugin content types (plugin_data.proto)
_MESH_VERTEX, _MESH_FACE, _MESH_COLOR = 1, 2, 3


def _mesh_plugin_data(name: str, content_type: int, components: int,
                      shape, json_config: str = "{}") -> bytes:
    """tensorboard.mesh.MeshPluginData (plugin_data.proto): version=1,
    name=2, content_type=3, components=4, json_config=5, shape=6."""
    msg = (
        _pb_int(1, 0)
        + _pb_bytes(2, name.encode())
        + _pb_enum(3, content_type)
        + _pb_int(4, components)
        + _pb_bytes(5, json_config.encode())
    )
    for d in shape:
        msg += _pb_int(6, int(d))
    return msg


def _summary_value_mesh_tensor(tag: str, name: str, content_type: int,
                               components: int, arr: np.ndarray) -> bytes:
    """Summary.Value{tag=1, metadata=9 SummaryMetadata{plugin_data=1
    PluginData{plugin_name=1 'mesh', content=2 MeshPluginData}}, tensor=8}."""
    plugin = _pb_bytes(1, b"mesh") + _pb_bytes(
        2, _mesh_plugin_data(name, content_type, components, arr.shape)
    )
    metadata = _pb_bytes(1, plugin)
    return _pb_bytes(
        1,
        _pb_bytes(1, tag.encode())
        + _pb_bytes(8, _tensor_proto(arr))
        + _pb_bytes(9, metadata),
    )


def _pb_pbvalue(v) -> bytes:
    """google.protobuf.Value (struct.proto): null_value=1 enum,
    number_value=2 double, string_value=3 string, bool_value=4 bool."""
    if isinstance(v, bool):
        return _pb_enum(4, int(v))
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return _pb_double(2, float(v))
    if v is None:
        return _pb_enum(1, 0)
    return _pb_bytes(3, str(v).encode())


def _summary_value_hparams(hparams: Dict[str, Any]) -> bytes:
    """Summary.Value carrying the hparams plugin's SessionStartInfo — the
    record TensorBoard's HPARAMS tab reads (what lightning's
    TensorBoardLogger.log_hyperparams writes via the reference's
    log_hyperparameters, src/utils/logging_utils.py:12-60).

    plugin_data.proto: HParamsPluginData{version=1, session_start_info=3
    SessionStartInfo{hparams=1 map<string, google.protobuf.Value>}};
    map entries encode as repeated {key=1, value=2}. Tag is the plugin's
    fixed SESSION_START_INFO_TAG."""
    entries = b"".join(
        _pb_bytes(1, _pb_bytes(1, k.encode()) + _pb_bytes(2, _pb_pbvalue(v)))
        for k, v in hparams.items()
    )
    session_start = entries + _pb_double(5, time.time())
    plugin_content = _pb_int(1, 0) + _pb_bytes(3, session_start)
    plugin = _pb_bytes(1, b"hparams") + _pb_bytes(2, plugin_content)
    metadata = _pb_bytes(1, plugin)
    return _pb_bytes(
        1,
        _pb_bytes(1, b"_hparams_/session_start_info") + _pb_bytes(9, metadata),
    )


def _flatten_hparams(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten a nested config into dotted scalar keys (lists stringify)."""
    out: Dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_hparams(v, key + "."))
        elif isinstance(v, (str, int, float, bool)) or v is None:
            out[key] = v
        else:
            out[key] = str(v)
    return out


class TensorBoardLogger:
    """Writes real tfevents files without tensorflow/tensorboardX: Event
    protos hand-encoded into TFRecord framing (length + masked-CRC32C),
    readable by stock TensorBoard. Reference surface:
    configs/logger/tensorboard.yaml (lightning.TensorBoardLogger) and
    tensorboard_mesh.yaml (TensorBoardMeshLogger.add_mesh,
    src/utils/tb_mesh_logger.py:20-44) — scalars + image summaries + mesh
    plugin summaries all land in one events file."""

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

    def _write_summary(self, summary: bytes, step: int) -> None:
        msg = _pb_double(1, time.time())
        if step:
            msg += _pb_int(2, int(step))
        msg += _pb_bytes(5, summary)
        self._write(msg)

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        scalars = {k: float(v) for k, v in metrics.items()}
        self._write(_tf_event(time.time(), step=int(step), scalars=scalars))

    def log_image(self, tag: str, image: np.ndarray, step: int = 0) -> None:
        """image: (H, W, C) uint8 (or float, normalized here)."""
        from ..utils.image import encode_png

        arr = np.asarray(image)
        if arr.ndim == 3 and arr.shape[0] in (1, 3):
            arr = arr.transpose(1, 2, 0)
        if arr.dtype != np.uint8:
            lo, hi = float(arr.min()), float(arr.max())
            arr = ((arr - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
        h, w = arr.shape[:2]
        c = 1 if arr.ndim == 2 else arr.shape[2]
        self._write_summary(
            _summary_value_image(tag, encode_png(arr), h, w, c), step
        )

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        """Hyperparameters into the TensorBoard HPARAMS tab (hparams
        plugin SessionStartInfo; nested configs flatten to dotted keys)."""
        self._write_summary(
            _summary_value_hparams(_flatten_hparams(hparams)), step=0
        )

    def log_mesh(self, tag: str, vertices: np.ndarray,
                 faces: Optional[np.ndarray] = None,
                 colors: Optional[np.ndarray] = None, step: int = 0) -> None:
        """Mesh-plugin summary (the reference TensorBoardMeshLogger's
        add_mesh surface). vertices (N, 3) float; faces (F, 3) int;
        colors (N, 3) uint8. Each component is its own tagged tensor
        summary carrying MeshPluginData metadata, batched to rank 3 as
        the plugin requires."""
        components = 1 << _MESH_VERTEX
        if faces is not None:
            components |= 1 << _MESH_FACE
        if colors is not None:
            components |= 1 << _MESH_COLOR
        parts = [(f"{tag}_VERTEX", _MESH_VERTEX,
                  np.asarray(vertices, np.float32)[None])]
        if faces is not None:
            parts.append((f"{tag}_FACE", _MESH_FACE,
                          np.asarray(faces, np.int32)[None]))
        if colors is not None:
            parts.append((f"{tag}_COLOR", _MESH_COLOR,
                          np.asarray(colors, np.uint8)[None]))
        summary = b"".join(
            _summary_value_mesh_tensor(t, tag, ct, components, a)
            for t, ct, a in parts
        )
        self._write_summary(summary, step)


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

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        self.run.config.update(hparams, allow_val_change=True)


class _MlflowLogger:
    """mlflow scalar sink (reference configs/logger/mlflow.yaml)."""

    def __init__(self, cfg: Dict[str, Any]):
        import mlflow

        self._m = mlflow
        uri = cfg.get("tracking_uri")
        if uri:
            mlflow.set_tracking_uri(uri)
        if cfg.get("experiment_name"):
            mlflow.set_experiment(cfg["experiment_name"])
        self.run = mlflow.start_run(run_name=cfg.get("run_name"))

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        self._m.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        self._m.log_params({k: str(v) for k, v in hparams.items()})


class _NeptuneLogger:
    """neptune scalar sink (reference configs/logger/neptune.yaml)."""

    def __init__(self, cfg: Dict[str, Any]):
        import neptune

        self.run = neptune.init_run(
            project=cfg.get("project"), name=cfg.get("name"),
            mode=cfg.get("mode", "async"),
        )

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        for k, v in metrics.items():
            self.run[k].append(float(v), step=step)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        self.run["parameters"] = hparams


class _CometLogger:
    """comet_ml scalar sink (reference configs/logger/comet.yaml)."""

    def __init__(self, cfg: Dict[str, Any]):
        import comet_ml

        self.exp = comet_ml.Experiment(
            project_name=cfg.get("project_name"),
            experiment_key=cfg.get("experiment_key"),
        )

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        self.exp.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        self.exp.log_parameters(hparams)


class _AimLogger:
    """aim scalar sink (reference configs/logger/aim.yaml)."""

    def __init__(self, cfg: Dict[str, Any]):
        import aim

        self.run = aim.Run(repo=cfg.get("repo"), experiment=cfg.get("experiment"))

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        for k, v in metrics.items():
            self.run.track(float(v), name=k, step=step)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        for k, v in hparams.items():
            self.run[k] = v


_OPTIONAL_BACKENDS = {
    "mlflow": _MlflowLogger,
    "neptune": _NeptuneLogger,
    "comet": _CometLogger,
    "aim": _AimLogger,
}


def log_hyperparameters(cfg: Dict[str, Any], params, logger) -> None:
    """Select the run's hyperparameters and fan them to every logger
    backend — the reference's log_hyperparameters contract
    (src/utils/logging_utils.py:12-60): the model/data/trainer/callbacks
    config subtrees, task metadata (task_name/tags/ckpt_path/seed), and
    the model's parameter counts (all params are trainable in a flax
    TrainState; frozen teacher featurizers live outside `params`, so
    non_trainable is structurally 0 here)."""
    from .state import param_count

    hparams: Dict[str, Any] = {}
    if "model" in cfg:
        hparams["model"] = cfg["model"]
    n = param_count(params)
    hparams["model/params/total"] = n
    hparams["model/params/trainable"] = n
    hparams["model/params/non_trainable"] = 0
    for key in ("data", "trainer", "callbacks", "extras"):
        if cfg.get(key) is not None:
            hparams[key] = cfg[key]
    for key in ("task_name", "tags", "ckpt_path", "seed"):
        hparams[key] = cfg.get(key)
    logger.log_hparams(hparams)


class MetricsLogger:
    """Bundles the configured scalar loggers + the local artifact sink
    (the reference's logger list with a .local attribute)."""

    def __init__(self, save_dir: str, cfg: Optional[Dict[str, Any]] = None):
        cfg = cfg or {}
        self.scalar_loggers = []
        if not self._rank0():
            # non-zero ranks never write (every log_* call below early-
            # returns), so don't construct backends either: external
            # trackers (wandb/mlflow/neptune/comet/aim) open a server-side
            # run at construction time — building them per-process would
            # create N-1 permanently empty duplicate runs under the
            # multi-process runtime
            self.local = LocalWriter(save_dir, mute=True)
            return
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
        # optional-import external backends (reference configs/logger/
        # {mlflow,neptune,comet,aim}.yaml); missing installs degrade to a
        # warning rather than a crash so shared configs stay portable
        for key, cls in _OPTIONAL_BACKENDS.items():
            if key in cfg:
                try:
                    self.scalar_loggers.append(cls(cfg[key] or {}))
                except ImportError:
                    get_logger().warning(
                        f"logger backend '{key}' requested but not installed; skipping"
                    )
        if not self.scalar_loggers:
            self.scalar_loggers.append(CSVLogger(save_dir))
        local_cfg = cfg.get("local", {})
        self.local = LocalWriter(
            local_cfg.get("save_dir", save_dir), mute=local_cfg.get("mute_local", False)
        )

    @staticmethod
    def _rank0() -> bool:
        from ..parallel.platform import is_rank0

        return is_rank0()

    def log_metrics(self, metrics: Dict[str, Any], step: int) -> None:
        # rank-0-only file writes under the multi-process runtime (the
        # metrics are jit-global and identical on every process; N
        # processes appending the same rows would duplicate them)
        if not self._rank0():
            return
        for lg in self.scalar_loggers:
            lg.log_metrics(metrics, step)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        """Fan the run's hyperparameters out to every backend (tfevents
        hparams plugin, hparams.yaml next to metrics.csv, external
        trackers' native param APIs) — the reference's
        log_hyperparameters fan-out (src/utils/logging_utils.py:12-60)."""
        if not self._rank0():
            return
        for lg in self.scalar_loggers:
            if hasattr(lg, "log_hparams"):
                lg.log_hparams(hparams)

    def log_image(self, tag: str, image, step: int = 0) -> None:
        """Fan an image out to every backend that can take one (currently
        the tfevents writer) plus the local PNG sink."""
        if not self._rank0():
            return
        for lg in self.scalar_loggers:
            if hasattr(lg, "log_image"):
                lg.log_image(tag, np.asarray(image), step)
        self.local.log_image(image, tag)

    def log_mesh(self, tag: str, mesh, step: int = 0) -> None:
        """Fan a mesh out: tfevents mesh-plugin summaries (the reference
        TensorBoardMeshLogger surface, tb_mesh_logger.py:20-44) + the
        local .ply sink. `mesh` is a utils.mesh.Mesh (vertices/faces,
        optional vertex colors)."""
        if not self._rank0():
            return
        verts = np.asarray(mesh.vertices, np.float32)
        faces = np.asarray(mesh.faces, np.int32) if getattr(mesh, "faces", None) is not None else None
        colors = getattr(mesh, "vertex_colors", None)
        colors = np.asarray(colors, np.uint8) if colors is not None else None
        for lg in self.scalar_loggers:
            if hasattr(lg, "log_mesh"):
                lg.log_mesh(tag, verts, faces, colors, step)
        self.local.log_mesh(mesh, tag)
