"""Dataset readers over the canonical ScanNet layout (info.json + tar'd
jpg/png + tsdf_XX.npz — reference datasets/README format).

Reference: src/data/data.py. Host-side numpy throughout (the reference used
torch tensors on CPU); decoded frames flow into the fixed-shape collate and
then to the device in one transfer.
"""
from __future__ import annotations

import io
import json
import os
import tarfile
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..tsdf import TSDF

DEPTH_SHIFT = 1000.0


class _BlobCache:
    """Thread-safe LRU for decoded frames / GT volumes (capacity 0 = off).

    The overfit/one-scene research loop (reference FrameDataset /
    OneSceneDataset) re-decodes the SAME jpg/png frames and re-reads the
    same npz volume every epoch; caching the decoded blobs is
    numerics-identical (same bytes) and removes that IO from the epoch.
    Opt-in via `data.cache_items` (datamodule)."""

    def __init__(self):
        self.cap = 0
        self._d: "OrderedDict[str, object]" = OrderedDict()
        self._lock = threading.Lock()

    def configure(self, capacity: int) -> None:
        with self._lock:
            self.cap = int(capacity)
            if self.cap <= 0:
                self._d.clear()

    def get(self, key):
        with self._lock:
            if self.cap <= 0 or key not in self._d:
                return None
            self._d.move_to_end(key)
            return self._d[key]

    def put(self, key, val) -> None:
        with self._lock:
            if self.cap <= 0:
                return
            self._d[key] = val
            self._d.move_to_end(key)
            while len(self._d) > self.cap:
                self._d.popitem(last=False)


_frame_cache = _BlobCache()
_volume_cache = _BlobCache()


def configure_item_cache(frames: int = 0, volumes: int = 0) -> None:
    """Enable/disable the decoded-frame and GT-volume caches (process-wide;
    capacities in items)."""
    _frame_cache.configure(frames)
    _volume_cache.configure(volumes)


def load_info_json(json_file: str) -> dict:
    with open(json_file) as f:
        return json.load(f)


def open_from_archive(full_path: str) -> Image.Image:
    """Load 'scene/color/1.jpg' from 'scene/color/color.tar'
    (reference data.py:156-170)."""
    dir_path, frame_name = os.path.split(full_path)
    base_dir = os.path.basename(dir_path)
    tar_path = os.path.join(dir_path, base_dir + ".tar")
    with tarfile.open(tar_path, "r") as tar_file:
        member = tar_file.getmember(frame_name)
        data = tar_file.extractfile(member).read()
    img = Image.open(io.BytesIO(data))
    img.load()
    return img


def _load_image(path: str, from_archive: bool) -> Image.Image:
    return open_from_archive(path) if from_archive else Image.open(path)


# modes whose pixel data round-trips exactly through (np.array, mode);
# palettized 'P' (and other exotic) images carry non-array state that
# Image.fromarray would drop, so they bypass the cache
_CACHEABLE_MODES = {"RGB", "RGBA", "L", "LA", "F", "I", "I;16"}


def _cached_image(path: str, loader) -> Image.Image:
    """Fetch a decoded image through the frame cache; `loader()` produces
    the PIL image on miss. Cache stores (array, mode); hits rebuild a
    fresh Image so downstream transforms can't alias across items."""
    hit = _frame_cache.get(path)
    if hit is not None:
        arr, mode = hit
        return Image.fromarray(arr.copy(), mode)
    img = loader()
    if _frame_cache.cap > 0 and img.mode in _CACHEABLE_MODES:
        _frame_cache.put(path, (np.array(img), img.mode))
    return img


def map_frame(frame: dict, frame_types: Sequence[str] = (), from_archive: bool = True) -> dict:
    """Load images + metadata of one frame (reference data.py:47-83)."""
    data = dict(frame)
    data["image"] = _cached_image(
        frame["file_name_image"],
        lambda: _load_image(frame["file_name_image"], from_archive),
    )
    if "depth" in frame_types:
        def load_depth():
            depth = _load_image(frame["file_name_depth"], from_archive)
            depth = np.array(depth, dtype=np.float32) / DEPTH_SHIFT
            return Image.fromarray(depth)

        data["depth"] = _cached_image(frame["file_name_depth"], load_depth)
    data["intrinsics"] = np.array(frame["intrinsics"], dtype=np.float32)
    data["pose"] = np.array(frame["pose"], dtype=np.float32)
    return data


def map_frames(frames: List[dict], frame_ids, frame_types=(), from_archive=True) -> List[dict]:
    """Batch-load frames, opening each tar once (reference data.py:86-131)."""
    frames_data = [dict(frames[i]) for i in frame_ids]
    if from_archive and frames_data:
        for is_depth in ([False, True] if "depth" in frame_types else [False]):
            key = "file_name_depth" if is_depth else "file_name_image"
            out_key = "depth" if is_depth else "image"
            misses = []
            for data in frames_data:
                hit = _frame_cache.get(data[key])
                if hit is not None:
                    arr, mode = hit
                    data[out_key] = Image.fromarray(arr.copy(), mode)
                else:
                    misses.append(data)
            if not misses:
                continue
            dir_path, _ = os.path.split(misses[0][key])
            tar_path = os.path.join(dir_path, os.path.basename(dir_path) + ".tar")
            with tarfile.open(tar_path, "r") as tar_file:
                for data in misses:
                    name = os.path.split(data[key])[1]
                    raw = tar_file.extractfile(tar_file.getmember(name)).read()
                    img = Image.open(io.BytesIO(raw))
                    img.load()
                    if is_depth:
                        arr = np.array(img, dtype=np.float32) / DEPTH_SHIFT
                        img = Image.fromarray(arr)
                    data[out_key] = img
                    if _frame_cache.cap > 0 and img.mode in _CACHEABLE_MODES:
                        _frame_cache.put(data[key], (np.array(img), img.mode))
    elif not from_archive:
        for data in frames_data:
            data["image"] = _cached_image(
                data["file_name_image"],
                lambda p=data["file_name_image"]: Image.open(p),
            )
            if "depth" in frame_types:
                def load_depth(p=data["file_name_depth"]):
                    arr = np.array(Image.open(p), dtype=np.float32) / DEPTH_SHIFT
                    return Image.fromarray(arr)

                data["depth"] = _cached_image(data["file_name_depth"], load_depth)
    for data in frames_data:
        data["intrinsics"] = np.array(data["intrinsics"], dtype=np.float32)
        data["pose"] = np.array(data["pose"], dtype=np.float32)
    return frames_data


def map_tsdf(info: dict, data: dict, voxel_types, voxel_sizes) -> dict:
    """Load GT TSDF volumes (reference data.py:134-153). The cache stores
    HOST-side numpy blobs (not jnp buffers — pinning up to `volumes`
    production-scale volumes in HBM is the wrong trade; the win is skipping
    the npz decompress, and the per-item device upload happens during the
    transform chain either way); a fresh jnp-backed TSDF is built per
    access, so sharing is trivially safe."""
    if len(voxel_types) > 0:
        for scale in voxel_sizes:
            fname = info["file_name_vol_%02d" % scale]
            key = f"{fname}|{','.join(sorted(voxel_types))}"
            blob = _volume_cache.get(key)
            if blob is None:
                vol = TSDF.load(fname, list(voxel_types))
                blob = (
                    vol.voxel_size,
                    np.asarray(vol.origin),
                    np.asarray(vol.tsdf_vol),
                    {k: np.asarray(v) for k, v in vol.attribute_vols.items()},
                )
                _volume_cache.put(key, blob)
            vs, origin, tsdf_vol, attr = blob
            data["vol_%02d" % scale] = TSDF(
                vs, jnp.asarray(origin), jnp.asarray(tsdf_vol),
                {k: jnp.asarray(v) for k, v in attr.items()},
            )
    return data


def parse_splits_list(splits, data_dir: Optional[str] = None) -> List[str]:
    """Expand split .txt files / .json paths (reference data.py:624-643)."""
    if isinstance(splits, str):
        splits = splits.split()
    info_files: List[str] = []
    for split in splits:
        # an absolute path that exists is used verbatim (the eval CLIs pass
        # --dataset /abs/val.txt --data-dir /abs); otherwise leading "/" is
        # treated as data_dir-relative like the reference's split lists
        if data_dir and not (os.path.isabs(split) and os.path.exists(split)):
            split_path = os.path.join(data_dir, split.lstrip("/"))
        else:
            split_path = split
        ext = os.path.splitext(split)[1]
        if ext == ".json":
            info_files.append(split_path)
        elif ext == ".txt":
            with open(split_path) as f:
                lines = [line.strip() for line in f if line.strip()]
            # relative info paths resolve against data_dir, like the .json
            # branch (split files list repo/data-relative paths)
            info_files += [
                line if os.path.isabs(line) or not data_dir
                else os.path.join(data_dir, line)
                for line in lines
            ]
        else:
            raise NotImplementedError(f"{split} not a valid info_file type")
    return info_files


def _find_first_higher_index(lst, val):
    for i, x in enumerate(lst):
        if x > val:
            return i
    return None


class SceneDataset:
    """Per-frame dataset over one scene (reference data.py:211-288);
    used by data prep and offline eval."""

    def __init__(self, info_file, transform=None, frame_types=(), voxel_types=(),
                 voxel_sizes=(), num_frames=-1, from_archive=True):
        self.info = load_info_json(info_file)
        self.transform = transform
        self.frame_types = frame_types
        self.voxel_types = voxel_types
        self.voxel_sizes = voxel_sizes
        self.from_archive = from_archive
        if num_frames > -1:
            length = len(self.info["frames"])
            inds = np.linspace(0, length - 1, num_frames, dtype=int)
            self.info["frames"] = [self.info["frames"][i] for i in inds]

    def __len__(self):
        return len(self.info["frames"])

    def __getitem__(self, i):
        frame = map_frame(self.info["frames"][i], self.frame_types, self.from_archive)
        data = {"dataset": self.info["dataset"], "frames": [frame]}
        if self.transform is not None:
            data = self.transform(data)
        return data["frames"][0]

    def get_tsdf(self):
        data = {"dataset": self.info["dataset"], "frames": []}
        data = map_tsdf(self.info, data, self.voxel_types, self.voxel_sizes)
        if self.transform is not None:
            data = self.transform(data)
        return data

    def get_mesh(self):
        from ..utils.mesh import Mesh

        return Mesh.load(self.info["file_name_mesh_gt"])


class ScenesDataset:
    """Scene -> N frames + TSDF; inference path (reference data.py:291-407)."""

    def __init__(self, info_files, num_frames, frame_locations, frame_order,
                 transform=None, frame_types=(), voxel_types=(), voxel_sizes=(),
                 from_archive=True, voxel_dim=None, rng=None):
        self.info_files = list(info_files)
        self.num_frames = num_frames
        self.frame_locations = frame_locations
        self.frame_order = frame_order
        self.transform = transform
        self.frame_types = frame_types
        self.voxel_types = voxel_types
        self.voxel_sizes = voxel_sizes
        self.from_archive = from_archive
        self.voxel_dim = voxel_dim
        self.rng = rng or np.random.default_rng()

    def __len__(self):
        return len(self.info_files)

    def get_frame_ids(self, info):
        length = len(info["frames"])
        num_frames = length if (self.num_frames == -1 or self.num_frames > length) else self.num_frames
        if self.frame_locations == "random":
            return self.rng.integers(0, length, size=num_frames)
        if self.frame_locations == "evenly_spaced":
            idxs = np.linspace(0, length - 1, num_frames, dtype=int)
            self.rng.shuffle(idxs)
            return idxs
        raise NotImplementedError(f"frame_locations: {self.frame_locations}")

    def __getitem__(self, i):
        info = load_info_json(self.info_files[i])
        frame_ids = self.get_frame_ids(info)
        if self.frame_order == "sorted":
            frame_ids = np.sort(frame_ids)
        elif self.frame_order != "random":
            raise NotImplementedError(f"frame_order: {self.frame_order}")

        frames = map_frames(info["frames"], frame_ids, self.frame_types, self.from_archive)
        data = {"dataset": info["dataset"], "scene": info["scene"], "frames": frames}
        data = map_tsdf(info, data, self.voxel_types, self.voxel_sizes)

        if self.transform is not None:
            return self.transform(data)

        # default inference path (reference data.py:354-387): shift origin,
        # resample GT into the canonical frame
        from . import transforms as T

        voxel_scale = self.voxel_sizes[0] if self.voxel_sizes else None
        # gate on what map_tsdf actually LOADED (voxel_types may be [] for
        # GT-less predict even when the info file carries a GT volume)
        if voxel_scale is not None and ("vol_%02d" % voxel_scale) in data:
            tsdf_trgt = data["vol_%02d" % voxel_scale]
            voxel_size = float(voxel_scale) / 100
            shift = np.array([0.5, 0.5, 0.5]) // voxel_size
            offset = np.asarray(tsdf_trgt.origin).reshape(3) - shift * voxel_size
        else:
            offset = np.array([0.0, 0.0, -0.5])
        data["offset"] = offset.reshape(1, 3).astype(np.float32)
        mat = np.eye(4, dtype=np.float32)
        mat[:3, 3] = offset
        transform = T.Compose([
            T.ResizeImage((640, 480)),
            T.ToArray(),
            T.TransformSpace(mat, self.voxel_dim, [0, 0, 0]),
            T.FlattenTSDF(),
            T.IntrinsicsPoseToProjection(),
        ])
        return transform(data)


class ScenesSequencesDataset:
    """Scene -> sequence windows -> frames (reference data.py:410-584)."""

    def __init__(self, info_files, sequence_amount, sequence_length,
                 sequence_locations, sequence_order, num_frames, frame_locations,
                 frame_order, transform=None, frame_types=(), voxel_types=(),
                 voxel_sizes=(), from_archive=True, rng=None):
        self.info_files = list(info_files)
        self.sequence_amount = sequence_amount
        self.sequence_length = sequence_length
        self.sequence_locations = sequence_locations
        self.sequence_order = sequence_order
        self.num_frames = num_frames
        self.frame_locations = frame_locations
        self.frame_order = frame_order
        self.transform = transform
        self.frame_types = frame_types
        self.voxel_types = voxel_types
        self.voxel_sizes = voxel_sizes
        self.from_archive = from_archive
        self.rng = rng or np.random.default_rng()

        start_idxs_list, num_sequences_list, drop = [], [], []
        for i, info_file in enumerate(self.info_files):
            info = load_info_json(info_file)
            n = len(info["frames"])
            num_sequences = int(self.sequence_amount * (n / self.sequence_length))
            if n < self.sequence_length:
                drop.append(i)
                continue
            if num_sequences == 0:
                import warnings

                warnings.warn(
                    f"{info_file}: sequence_amount={self.sequence_amount} x "
                    f"({n} frames / {self.sequence_length} window) floors to "
                    f"ZERO windows — the scene contributes no items (use "
                    f"sequence_amount >= {self.sequence_length / n:.2f} to "
                    f"keep one window)", stacklevel=2)
            num_sequences_list.append(num_sequences)
            start_idxs = self.calculate_start_idxs(n, num_sequences)
            if self.sequence_order == "sorted":
                start_idxs = np.sort(start_idxs)
            elif self.sequence_order != "random":
                raise NotImplementedError(f"sequence_order: {self.sequence_order}")
            start_idxs_list.append(start_idxs)
        for i in sorted(drop, reverse=True):
            del self.info_files[i]
        self.num_sequences_list = num_sequences_list
        self.start_idxs_list = start_idxs_list

    def calculate_start_idxs(self, num_scene_frames, num_sequences):
        if self.sequence_locations == "free":
            n = num_scene_frames - self.sequence_length + 1
            return self.rng.choice(n, num_sequences, replace=False)
        if self.sequence_locations == "fixed":
            n = num_scene_frames // self.sequence_length
            return self.rng.choice(n, num_sequences, replace=False) * self.sequence_length
        if self.sequence_locations == "evenly_spaced":
            if num_sequences == 1:
                idxs = np.array([(num_scene_frames - self.sequence_length) // 2])
            else:
                idxs = np.linspace(0, num_scene_frames - self.sequence_length, num=num_sequences).astype(int)
            self.rng.shuffle(idxs)
            return idxs
        raise NotImplementedError(f"sequence_locations: {self.sequence_locations}")

    def get_indices(self, item_idx):
        cum = np.cumsum(self.num_sequences_list)
        scene_idx = _find_first_higher_index(cum, item_idx)
        prev = 0 if scene_idx == 0 else cum[scene_idx - 1]
        return scene_idx, item_idx - prev

    def get_frame_ids(self, scene_idx, sequence_idx):
        low = self.start_idxs_list[scene_idx][sequence_idx]
        high = low + self.sequence_length
        if self.frame_locations == "random":
            return self.rng.choice(np.arange(low, high), self.num_frames, replace=False)
        if self.frame_locations == "evenly_spaced":
            idxs = np.linspace(low, high - 1, num=self.num_frames).astype(int)
            self.rng.shuffle(idxs)
            return idxs
        raise NotImplementedError(f"frame_locations: {self.frame_locations}")

    def __len__(self):
        return int(sum(self.num_sequences_list))

    def __getitem__(self, i):
        assert i >= 0
        scene_idx, sequence_idx = self.get_indices(i)
        info = load_info_json(self.info_files[scene_idx])
        frame_ids = self.get_frame_ids(scene_idx, sequence_idx)
        if self.frame_order == "sorted":
            frame_ids = np.sort(frame_ids)
        elif self.frame_order != "random":
            raise NotImplementedError(f"frame_order: {self.frame_order}")
        frames = map_frames(info["frames"], frame_ids, self.frame_types, self.from_archive)
        data = {"dataset": info["dataset"], "scene": info["scene"], "frames": frames}
        data = map_tsdf(info, data, self.voxel_types, self.voxel_sizes)
        if self.transform is not None:
            data = self.transform(data)
        return data


class FrameDataset:
    """Same frame repeated `length` times — overfit/debug fixture
    (reference data.py:646-699)."""

    def __init__(self, info_files, frame_idx, length, scene_idx=0, transform=None,
                 frame_types=(), voxel_types=(), voxel_sizes=(), from_archive=True):
        self.info = load_info_json(info_files[scene_idx])
        self.frame_idx = frame_idx
        self.length = length
        self.transform = transform
        self.frame_types = frame_types
        self.voxel_types = voxel_types
        self.voxel_sizes = voxel_sizes
        self.from_archive = from_archive

    def __len__(self):
        return self.length

    def __getitem__(self, i):
        frames = [map_frame(self.info["frames"][self.frame_idx], self.frame_types, self.from_archive)]
        data = {"dataset": self.info["dataset"], "scene": self.info["scene"], "frames": frames}
        data = map_tsdf(self.info, data, self.voxel_types, self.voxel_sizes)
        if self.transform is not None:
            data = self.transform(data)
        return data


class OneSceneDataset:
    """Fixed frame ids of one scene (reference data.py:702-775)."""

    def __init__(self, info_file, transform=None, frame_types=(), voxel_types=(),
                 voxel_sizes=(), frames=(), from_archive=True):
        self.info = load_info_json(info_file)
        self.transform = transform
        self.frame_types = frame_types
        self.voxel_types = voxel_types
        self.voxel_sizes = voxel_sizes
        self.from_archive = from_archive
        self.info["frames"] = [self.info["frames"][i] for i in frames]

    def __len__(self):
        return len(self.info["frames"])

    def __getitem__(self, i):
        frame = map_frame(self.info["frames"][i], self.frame_types, self.from_archive)
        data = {"dataset": self.info["dataset"], "scene": self.info.get("scene"), "frames": [frame]}
        data = map_tsdf(self.info, data, self.voxel_types, self.voxel_sizes)
        if self.transform is not None:
            data = self.transform(data)
        return data

    def get_tsdf(self):
        data = {"dataset": self.info["dataset"], "frames": []}
        data = map_tsdf(self.info, data, self.voxel_types, self.voxel_sizes)
        if self.transform is not None:
            data = self.transform(data)
        return data


def collate_fn(data_list: List[dict]) -> Dict[str, np.ndarray]:
    """Flatten items into a batch dict of (B, T, ...) arrays
    (reference data.py:587-621)."""
    keys = [k for k in data_list[0].keys() if k != "frames"]
    frame_keys = list(data_list[0]["frames"][0].keys()) if data_list[0]["frames"] else []

    out: Dict[str, list] = {key: [] for key in keys + frame_keys}
    for data in data_list:
        for key in keys:
            out[key].append(data[key])
        for key in frame_keys:
            val0 = data["frames"][0][key]
            if isinstance(val0, np.ndarray):
                out[key].append(np.stack([frame[key] for frame in data["frames"]]))
            else:
                out[key].append([frame.get(key) for frame in data["frames"]])
    for key in list(out.keys()):
        if out[key] and isinstance(out[key][0], np.ndarray):
            out[key] = np.stack(out[key])
    return out
