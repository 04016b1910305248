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
