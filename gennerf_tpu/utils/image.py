"""Minimal image I/O helpers (PIL-backed, zlib fallback for PNG writing)."""
from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, array: np.ndarray) -> None:
    """Write (H, W) or (H, W, {1,3,4}) uint8 (or uint16 grayscale) PNG."""
    try:
        from PIL import Image

        Image.fromarray(array.squeeze()).save(path)
        return
    except Exception:
        pass
    _write_png_raw(path, array)


def read_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def encode_png(array: np.ndarray) -> bytes:
    """PNG-encode (H, W[, C]) uint8 to bytes (TensorBoard image summaries)."""
    try:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.asarray(array).squeeze()).save(buf, format="PNG")
        return buf.getvalue()
    except Exception:
        import os
        import tempfile

        fd, tmp = tempfile.mkstemp(suffix=".png")
        os.close(fd)
        try:
            _write_png_raw(tmp, np.asarray(array))
            with open(tmp, "rb") as f:
                return f.read()
        finally:
            os.unlink(tmp)


def _write_png_raw(path: str, array: np.ndarray) -> None:
    """Dependency-free PNG writer (8-bit gray/RGB/RGBA, 16-bit gray)."""
    arr = np.asarray(array)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    H, W, C = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[C]
    bit_depth = 16 if arr.dtype == np.uint16 else 8
    if bit_depth == 16:
        raw = arr.astype(">u2").tobytes()
        stride = W * C * 2
    else:
        raw = arr.astype(np.uint8).tobytes()
        stride = W * C
    lines = b"".join(
        b"\x00" + raw[y * stride : (y + 1) * stride] for y in range(H)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", W, H, bit_depth, color_type, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)
