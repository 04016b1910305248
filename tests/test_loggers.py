"""Logger backends: tfevents writer format correctness (TFRecord framing,
CRC32C, Event proto), MetricsLogger backend selection."""
import os
import struct

import numpy as np
import pytest

from gennerf_tpu.train.loggers import (
    MetricsLogger,
    TensorBoardLogger,
    _crc32c,
    _masked_crc,
    _varint,
)


def test_crc32c_known_vectors():
    # canonical CRC-32C check value
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0x0
    # 32 zero bytes (RFC 3720 appendix B test vector)
    assert _crc32c(bytes(32)) == 0x8A9136AA


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header crc mismatch"
            data = f.read(length)
            (dcrc,) = struct.unpack("<I", f.read(4))
            assert dcrc == _masked_crc(data), "data crc mismatch"
            records.append(data)
    return records


def _decode_fields(buf):
    """Minimal proto wire decoder: returns list of (field, wire, value)."""
    out, i = [], 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            v = struct.unpack("<d", buf[i:i + 8])[0]
            i += 8
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = struct.unpack("<f", buf[i:i + 4])[0]
            i += 4
        else:
            raise AssertionError(f"wire {wire}")
        out.append((field, wire, v))
    return out


def test_tfevents_round_trip(tmp_path):
    tb = TensorBoardLogger(str(tmp_path))
    tb.log_metrics({"train_loss": 0.5, "lr": 1e-3}, step=7)
    tb.log_metrics({"train_loss": 0.25}, step=8)

    records = _read_records(tb.path)
    assert len(records) == 3  # file_version header + 2 metric events

    # header record carries file_version="brain.Event:2" (field 3)
    fields0 = dict((f, v) for f, _, v in _decode_fields(records[0]))
    assert fields0[3] == b"brain.Event:2"

    # first metric event: step 7 (field 2), summary (field 5)
    ev = _decode_fields(records[1])
    by_field = {}
    for f, _, v in ev:
        by_field.setdefault(f, []).append(v)
    assert by_field[2] == [7]
    summary = _decode_fields(by_field[5][0])
    values = {}
    for f, _, v in summary:
        assert f == 1
        inner = _decode_fields(v)
        tag = [x for fl, _, x in inner if fl == 1][0].decode()
        val = [x for fl, _, x in inner if fl == 2][0]
        values[tag] = val
    assert values["train_loss"] == pytest.approx(0.5)
    assert values["lr"] == pytest.approx(1e-3)


def test_metrics_logger_backend_selection(tmp_path):
    lg = MetricsLogger(str(tmp_path), {"tensorboard": {"save_dir": str(tmp_path)},
                                       "csv": {"save_dir": str(tmp_path)}})
    assert len(lg.scalar_loggers) == 2
    lg.log_metrics({"a": 1.0}, step=1)
    assert os.path.exists(os.path.join(tmp_path, "csv", "metrics.csv"))
    tb_dir = os.path.join(tmp_path, "tensorboard")
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(tb_dir))

    # wandb absent in this env -> warning + CSV fallback, no crash
    lg2 = MetricsLogger(str(tmp_path), {"wandb": {"project": "x"}})
    lg2.log_metrics({"a": 2.0}, step=1)


def test_tfevents_image_summary(tmp_path):
    """Byte-level: log_image writes a Summary.Value{tag, image{h, w,
    colorspace, encoded PNG}} event."""
    tb = TensorBoardLogger(str(tmp_path / "img"))
    img = (np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3))
    tb.log_image("val_render/overview", img, step=3)

    rec = _read_records(tb.path)[-1]
    ev = {f: v for f, _, v in _decode_fields(rec)}
    assert ev[2] == 3  # step
    value = _decode_fields(_decode_fields(ev[5])[0][2])
    by = {f: v for f, _, v in value}
    assert by[1] == b"val_render/overview"
    image = {f: v for f, _, v in _decode_fields(by[4])}
    assert image[1] == 6 and image[2] == 8 and image[3] == 3
    assert image[4][:8] == b"\x89PNG\r\n\x1a\n"  # a real PNG payload
    # the PNG decodes back to the exact pixels
    from PIL import Image
    import io

    back = np.asarray(Image.open(io.BytesIO(image[4])))
    np.testing.assert_array_equal(back, img)


def test_tfevents_mesh_summary(tmp_path):
    """Byte-level: log_mesh writes VERTEX/FACE/COLOR tensor summaries with
    mesh-plugin metadata (the reference TensorBoardMeshLogger surface,
    tb_mesh_logger.py:20-44)."""
    tb = TensorBoardLogger(str(tmp_path / "mesh"))
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    tb.log_mesh("val_mesh/pred", verts, faces, colors, step=2)

    rec = _read_records(tb.path)[-1]
    ev = {f: v for f, _, v in _decode_fields(rec)}
    values = [_decode_fields(v) for f, _, v in _decode_fields(ev[5]) if f == 1]
    assert len(values) == 3  # VERTEX + FACE + COLOR components
    seen = {}
    for value in values:
        by = {f: v for f, _, v in value}
        tag = by[1].decode()
        # SummaryMetadata.plugin_data.plugin_name == 'mesh'
        md = {f: v for f, _, v in _decode_fields(by[9])}
        plugin = {f: v for f, _, v in _decode_fields(md[1])}
        assert plugin[1] == b"mesh"
        # MeshPluginData: name (2), content_type (3), components (4)
        pd = {}
        for f, _, v in _decode_fields(plugin[2]):
            pd.setdefault(f, []).append(v)
        assert pd[2] == [b"val_mesh/pred"]
        # TensorProto: dtype (1), shape (2), content (4)
        tp = {}
        for f, _, v in _decode_fields(by[8]):
            tp.setdefault(f, []).append(v)
        seen[tag] = (pd[3][0], tp[1][0], b"".join(tp[4]))
    ct_v, dt_v, content_v = seen["val_mesh/pred_VERTEX"]
    assert (ct_v, dt_v) == (1, 1)  # VERTEX, DT_FLOAT
    np.testing.assert_array_equal(
        np.frombuffer(content_v, np.float32).reshape(1, 3, 3), verts[None])
    ct_f, dt_f, content_f = seen["val_mesh/pred_FACE"]
    assert (ct_f, dt_f) == (2, 3)  # FACE, DT_INT32
    np.testing.assert_array_equal(
        np.frombuffer(content_f, np.int32).reshape(1, 1, 3), faces[None])
    ct_c, dt_c, _ = seen["val_mesh/pred_COLOR"]
    assert (ct_c, dt_c) == (3, 4)  # COLOR, DT_UINT8


def test_metrics_logger_mesh_image_fanout(tmp_path):
    from gennerf_tpu.utils.mesh import Mesh

    lg = MetricsLogger(str(tmp_path), {"tensorboard": {"save_dir": str(tmp_path)},
                                       "local": {"save_dir": str(tmp_path)}})
    mesh = Mesh(np.array([[0., 0, 0], [1, 0, 0], [0, 1, 0]]),
                np.array([[0, 1, 2]]))
    lg.log_mesh("val_mesh/pred", mesh, step=1)
    lg.log_image("val_render/overview", np.zeros((4, 4, 3), np.uint8), step=1)
    # both sinks got both artifact kinds
    assert os.path.exists(os.path.join(tmp_path, "local", "val_mesh", "pred.ply"))
    assert os.path.exists(os.path.join(tmp_path, "local", "val_render", "overview.png"))
    tb = [l for l in lg.scalar_loggers if hasattr(l, "log_mesh")][0]
    recs = _read_records(tb.path)
    assert len(recs) == 3  # header + mesh event + image event


def test_tfevents_hparams_summary(tmp_path):
    """Byte-level: log_hparams writes the hparams plugin's
    SessionStartInfo under its fixed tag (the surface lightning's
    log_hyperparams puts in the HPARAMS tab)."""
    tb = TensorBoardLogger(str(tmp_path / "hp"))
    tb.log_hparams({"model": {"type": "gen_nerf", "mlp": {"d_hidden": 512}},
                    "seed": 7, "trainer": {"precision": "bf16-mixed"},
                    "flag": True})

    rec = _read_records(tb.path)[-1]
    ev = {f: v for f, _, v in _decode_fields(rec)}
    value = {f: v for f, _, v in
             _decode_fields(_decode_fields(ev[5])[0][2])}
    assert value[1] == b"_hparams_/session_start_info"
    md = {f: v for f, _, v in _decode_fields(value[9])}
    plugin = {f: v for f, _, v in _decode_fields(md[1])}
    assert plugin[1] == b"hparams"
    # HParamsPluginData.session_start_info (3) -> hparams map (1)
    pd = {}
    for f, _, v in _decode_fields(plugin[2]):
        pd.setdefault(f, []).append(v)
    entries = {}
    for entry in _decode_fields(pd[3][0]):
        if entry[0] != 1:
            continue  # start_time_secs
        kv = {f: v for f, _, v in _decode_fields(entry[2])}
        val = _decode_fields(kv[2])[0]
        entries[kv[1].decode()] = val
    # nested keys flatten to dots; types map onto google.protobuf.Value
    assert entries["model.type"] == (3, 2, b"gen_nerf")       # string_value
    assert entries["model.mlp.d_hidden"] == (2, 1, 512.0)     # number_value
    assert entries["seed"] == (2, 1, 7.0)
    assert entries["trainer.precision"] == (3, 2, b"bf16-mixed")
    assert entries["flag"] == (4, 0, 1)                       # bool_value


def test_metrics_logger_hparams_fanout(tmp_path):
    """MetricsLogger.log_hparams lands in both hparams.yaml (lightning
    CSVLogger surface) and the tfevents file; log_hyperparameters selects
    the reference's keys (logging_utils.py:12-60) incl. param counts."""
    import yaml

    import jax.numpy as jnp
    from gennerf_tpu.train.loggers import log_hyperparameters

    lg = MetricsLogger(str(tmp_path), {"tensorboard": {"save_dir": str(tmp_path)},
                                       "csv": {"save_dir": str(tmp_path)}})
    cfg = {"model": {"type": "gen_nerf"}, "data": {"batch_size": 2},
           "trainer": {"max_epochs": 3}, "task_name": "train",
           "tags": ["dev"], "seed": 1}
    params = {"dense": {"kernel": jnp.zeros((4, 8)), "bias": jnp.zeros((8,))}}
    log_hyperparameters(cfg, params, lg)

    hp_path = os.path.join(tmp_path, "csv", "hparams.yaml")
    assert os.path.exists(hp_path)
    with open(hp_path) as f:
        saved = yaml.safe_load(f)
    assert saved["model"] == {"type": "gen_nerf"}
    assert saved["model/params/total"] == 40
    assert saved["model/params/trainable"] == 40
    assert saved["model/params/non_trainable"] == 0
    assert saved["tags"] == ["dev"] and saved["seed"] == 1
    assert saved["ckpt_path"] is None  # reference logs absent keys as null
    tb = [l for l in lg.scalar_loggers if isinstance(l, TensorBoardLogger)][0]
    assert len(_read_records(tb.path)) == 2  # header + hparams event


def test_optional_backends_gated(tmp_path):
    """mlflow/neptune/comet/aim configs degrade to a warning when the lib
    is absent (reference configs/logger parity without forced installs)."""
    lg = MetricsLogger(str(tmp_path), {
        "mlflow": {"tracking_uri": str(tmp_path)},
        "neptune": {}, "comet": {}, "aim": {},
        "csv": {"save_dir": str(tmp_path)},
    })
    # none of the four is installed in this image -> only CSV remains
    assert len(lg.scalar_loggers) >= 1
    lg.log_metrics({"a": 1.0}, step=1)
