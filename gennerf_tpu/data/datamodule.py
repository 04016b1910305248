"""ScannetDataModule: dataset selection + transform chains + loaders.

Reference: src/data/datamodule.py. The loaders are host-side map-style
iterators with a multi-worker item pool (the reference's `num_workers`
DataLoader processes, datamodule.py:122-126): items load concurrently on a
thread pool (PIL/zlib release the GIL during decode, so threads overlap
IO + decompress without pickling the arrays back) while batches assemble
and yield strictly in order.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from . import transforms as T
from .datasets import (
    FrameDataset,
    OneSceneDataset,
    SceneDataset,
    ScenesDataset,
    ScenesSequencesDataset,
    collate_fn,
    parse_splits_list,
)


class LockedGenerator:
    """Thread-safe proxy over np.random.Generator: datasets and transforms
    draw randomness inside __getitem__, which the loader runs concurrently
    on a worker pool (np Generators are not thread-safe).

    Beyond the lock, the proxy supports deterministic per-item streams:
    inside an `item_scope(seed)` block (entered by the DataLoader around
    each __getitem__), draws come from a thread-local Generator seeded for
    that item — so the random stream an item sees depends only on
    (base seed, item serial), never on worker-thread scheduling. Without
    a scope (direct dataset use) draws fall back to the locked shared
    Generator."""

    def __init__(self, rng: np.random.Generator):
        self._rng = rng
        self._lock = threading.Lock()
        self._local = threading.local()

    def item_scope(self, seed):
        """Context manager binding this thread's draws to a fresh
        Generator seeded by `seed` (any np.random.default_rng seed)."""
        proxy = self

        class _Scope:
            def __enter__(self):
                proxy._local.rng = np.random.default_rng(seed)

            def __exit__(self, *exc):
                proxy._local.rng = None

        return _Scope()

    def __getattr__(self, name):
        local_rng = getattr(self._local, "rng", None)
        if local_rng is not None:
            return getattr(local_rng, name)
        fn = getattr(self._rng, name)
        if not callable(fn):
            return fn
        lock = self._lock

        def locked(*a, **k):
            with lock:
                return fn(*a, **k)

        return locked


class DataLoader:
    """Map-style loader: shuffle, batch, collate, multi-worker prefetch.

    num_workers > 0: items of the next `prefetch` batches load concurrently
    on a worker pool. num_workers == 0: fully synchronous (debug mode,
    matching the reference's num_workers=0).
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, collate=collate_fn,
                 drop_last=False, prefetch=2, seed=0, num_workers=4,
                 item_rng: Optional[LockedGenerator] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate = collate
        self.drop_last = drop_last
        self.prefetch = max(prefetch, 1)
        self.num_workers = num_workers
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        # deterministic per-item randomness: when the dataset/transforms
        # draw from `item_rng` (a LockedGenerator), each __getitem__ runs
        # under item_rng.item_scope((seed, serial)) where `serial` counts
        # items in submission order across epochs — the stream an item
        # sees depends only on (seed, serial), never on worker-thread
        # scheduling, and is identical for any num_workers setting
        self.item_rng = item_rng
        self._serial = 0

    def _job(self, i: int):
        """Zero-arg item loader; assigns the item's RNG serial NOW (in the
        deterministic submission order), executes later (any thread)."""
        if self.item_rng is None:
            return lambda: self.dataset[i]
        serial = self._serial
        self._serial += 1

        def job():
            with self.item_rng.item_scope((self.seed, serial)):
                return self.dataset[i]

        return job

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        for s in range(0, len(idx), self.batch_size):
            chunk = idx[s : s + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield [int(i) for i in chunk]

    def __iter__(self):
        if self.num_workers <= 0:
            for chunk in self._index_batches():
                yield self.collate([self._job(i)() for i in chunk])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: "queue.SimpleQueue" = queue.SimpleQueue()
            chunks = self._index_batches()
            in_flight = 0
            for chunk in chunks:
                pending.put([pool.submit(self._job(i)) for i in chunk])
                in_flight += 1
                if in_flight >= self.prefetch + 1:
                    break
            while in_flight:
                futures = pending.get()
                in_flight -= 1
                batch = self.collate([f.result() for f in futures])
                nxt = next(chunks, None)
                if nxt is not None:
                    pending.put([pool.submit(self._job(i)) for i in nxt])
                    in_flight += 1
                yield batch


class ScannetDataModule:
    """Builds datasets/loaders per stage (reference datamodule.py:11-255)."""

    def __init__(self, cfg: Dict, num_devices: int = 1, seed: int = 0):
        self.cfg = dict(cfg)
        self.num_devices = num_devices
        self.seed = seed
        c = self.cfg
        self.voxel_size = c["voxel_size"]
        self.voxel_types = c.get("voxel_types", ["tsdf"])
        # multi-scale voxel sizes when layers_down present (voxel net)
        layers_down = c.get("layers_down")
        base = int(self.voxel_size * 100)
        if layers_down:
            self.voxel_sizes = [base * 2**i for i in range(len(layers_down) - 1)]
        else:
            self.voxel_sizes = [base]
        self.frame_types = ["depth"]
        # opt-in decoded-item cache for the overfit/one-scene loops where
        # every epoch re-reads identical frames/volumes; numerics-identical
        # (same decoded bytes). True = sensible defaults; an int sets the
        # frame capacity directly.
        cache = c.get("cache_items", False)
        from .datasets import configure_item_cache

        if cache:
            frames_cap = 2048 if cache is True else int(cache)
            volumes_cap = int(c.get("cache_volumes", 64))
            configure_item_cache(frames=frames_cap, volumes=volumes_cap)
            self._enabled_cache = True
        else:
            self._enabled_cache = False
            # the cache is process-global but host-side and
            # capacity-bounded; a datamodule that did not opt in simply
            # doesn't benefit — tearing it down here would destroy the
            # warm cache of a still-in-use sibling datamodule. Explicit
            # cache_items=0 (vs absent/False) clears it.
            if "cache_items" in c and c["cache_items"] == 0 and c["cache_items"] is not False:
                configure_item_cache(frames=0, volumes=0)
        # global batch must divide by device count (reference datamodule.py:100-106
        # divides by world size; under jit-sharding we keep the global size and
        # shard axis 0, so we only validate divisibility)
        if c.get("batch_size", 1) % max(num_devices, 1) != 0:
            raise ValueError(
                f"batch_size {c.get('batch_size')} not divisible by devices {num_devices}"
            )

    # -- transforms -----------------------------------------------------------
    def get_transform(self, mode: str, rng=None):
        """Transform chain per mode (reference datamodule.py:218-255)."""
        c = self.cfg
        voxel_dim = {
            "train": c["voxel_dim_train"],
            "val": c["voxel_dim_val"],
            "test": c["voxel_dim_test"],
        }[mode]
        transforms = [T.ResizeImage((640, 480)), T.ToArray()]
        if mode == "train":
            transforms += [
                T.RandomTransformSpace(
                    voxel_dim,
                    random_rotation=c.get("random_rotation_3d", False),
                    random_translation=c.get("random_translation_3d", False),
                    paddingXY=c.get("pad_xy_3d", 0.0),
                    paddingZ=c.get("pad_z_3d", 0.0),
                    rng=rng,
                )
            ]
        else:
            # centered transform (no augmentation)
            transforms += [
                T.RandomTransformSpace(
                    voxel_dim, random_rotation=False, random_translation=False,
                    paddingXY=c.get("pad_xy_3d", 0.0), paddingZ=c.get("pad_z_3d", 0.0),
                    rng=rng,
                )
            ]
        transforms += [T.FlattenTSDF(), T.IntrinsicsPoseToProjection()]
        return T.Compose(transforms)

    # -- datasets ---------------------------------------------------------------
    def _info_files(self, mode: str) -> List[str]:
        c = self.cfg
        return parse_splits_list(c[f"datasets_{mode}"], c.get("data_dir"))

    def choose_dataset(self, mode: str):
        c = self.cfg
        # stable per-mode stream: python hash() is randomized per process
        # (PYTHONHASHSEED), which silently broke run-to-run reproducibility
        import zlib

        mode_salt = zlib.crc32(mode.encode()) % 1000
        rng = LockedGenerator(np.random.default_rng(self.seed + mode_salt))
        self._mode_rng = rng          # the loader scopes it per item
        self._mode_seed = self.seed + mode_salt
        transform = self.get_transform(mode, rng)
        dtype = c.get("dataset_type", "sequences")
        from_archive = c.get("from_archive", False)
        common = dict(
            transform=transform,
            frame_types=self.frame_types,
            voxel_types=self.voxel_types,
            voxel_sizes=self.voxel_sizes,
            from_archive=from_archive,
        )
        if dtype == "sequences":
            return ScenesSequencesDataset(
                self._info_files(mode),
                sequence_amount=c[f"sequence_amount_{mode}"],
                sequence_length=c["sequence_length"],
                sequence_locations=c["sequence_locations"],
                sequence_order=c["sequence_order"],
                num_frames=c[f"num_frames_{mode}"],
                frame_locations=c["frame_locations"],
                frame_order=c["frame_order"],
                rng=rng,
                **common,
            )
        if dtype == "scenes":
            return ScenesDataset(
                self._info_files(mode),
                num_frames=c[f"num_frames_{mode}"],
                frame_locations=c.get("frame_selection", "evenly_spaced"),
                frame_order=c.get("frame_order", "sorted"),
                rng=rng,
                **common,
            )
        if dtype == "frame":
            return FrameDataset(
                self._info_files(mode),
                frame_idx=c["frame_idx"],
                length=c[f"length_{mode}"],
                scene_idx=c.get("scene_idx", 0),
                **common,
            )
        if dtype == "scene":
            return OneSceneDataset(
                self._info_files(mode)[c.get("scene_idx", 0)],
                frames=c[f"frames_{mode}"],
                **common,
            )
        raise NotImplementedError(f"dataset_type {dtype}")

    # -- loaders ---------------------------------------------------------------
    def _loader(self, mode: str, shuffle: bool) -> DataLoader:
        ds = self.choose_dataset(mode)
        # per-item deterministic randomness (see DataLoader._job): the
        # dataset/transforms draw from the mode's LockedGenerator, which
        # the loader re-seeds per item from (mode seed, item serial)
        return DataLoader(
            ds,
            batch_size=self.cfg.get("batch_size", 1),
            shuffle=shuffle,
            seed=self._mode_seed,
            num_workers=self.cfg.get(f"num_workers_{mode}",
                                     self.cfg.get("num_workers", 4)),
            item_rng=self._mode_rng,
        )

    def train_dataloader(self) -> DataLoader:
        return self._loader("train", self.cfg.get("shuffle_train", True))

    def val_dataloader(self) -> DataLoader:
        return self._loader("val", self.cfg.get("shuffle_val", False))

    def test_dataloader(self) -> DataLoader:
        return self._loader("test", self.cfg.get("shuffle_test", False))

    def predict_dataloader(self) -> DataLoader:
        c = dict(self.cfg)
        ds = ScenesDataset(
            self._info_files("test"),
            num_frames=c.get("num_frames_test", -1),
            frame_locations=c.get("frame_selection", "evenly_spaced"),
            frame_order=c.get("frame_order", "sorted"),
            transform=None,
            frame_types=self.frame_types,
            voxel_types=self.voxel_types,
            voxel_sizes=self.voxel_sizes,
            from_archive=c.get("from_archive", False),
            voxel_dim=c["voxel_dim_test"],
        )
        return DataLoader(ds, batch_size=1, shuffle=False, seed=self.seed)
