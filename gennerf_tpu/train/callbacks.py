"""Trainer callback analogs.

The reference ships a Lightning callback group (configs/callbacks/: model
summary, rich progress bar, CUDA cache clearing — reference
configs/callbacks/default.yaml composes model_checkpoint +
rich_progress_bar + clear_cache). Checkpointing and early stopping are
first-class Trainer features here (train/checkpoints.py, train/loop.py);
this module provides the remaining three as small host-side hooks:

- ``summarize_params``: depth-limited parameter table, the
  RichModelSummary surface (reference configs/callbacks/model_summary.yaml).
- ``ProgressBar``: single-line in-place progress on stderr (the
  RichProgressBar surface, reference configs/callbacks/rich_progress_bar.yaml)
  — throttled so it never adds host work to the step cadence.
- ``clear_device_caches``: the CudaClearCacheCallback analog (reference
  src/utils/clear_cache_cb.py empties the CUDA allocator between train and
  val). XLA owns HBM directly — there is no allocator cache to flush — so
  the TPU-native analog drops dead host references (gc) so their device
  buffers are freed, and reports live-buffer stats for observability.
"""
from __future__ import annotations

import gc
import sys
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# model summary (reference configs/callbacks/model_summary.yaml)
# ---------------------------------------------------------------------------

def _walk(tree: Dict[str, Any], prefix: List[str], rows: Dict[str, Dict[str, Any]],
          max_depth: int) -> None:
    for name, sub in tree.items():
        path = prefix + [str(name)]
        if isinstance(sub, dict):
            _walk(sub, path, rows, max_depth)
            continue
        # shapeless leaves (plain python scalars) count as one f64-sized
        # parameter; np.asarray gives them a () shape + dtype without
        # touching device arrays (those already carry both attributes)
        arr = sub if hasattr(sub, "shape") else np.asarray(sub)
        # aggregate leaves at the configured nesting depth (max_depth=-1
        # keeps every module level, like Lightning's RichModelSummary)
        depth = len(path) - 1 if max_depth < 0 else min(max_depth, len(path) - 1)
        key = "/".join(path[:depth]) or "(root)"
        row = rows.setdefault(key, {"params": 0, "bytes": 0, "dtypes": set()})
        row["params"] += int(np.prod(arr.shape))
        row["bytes"] += int(np.prod(arr.shape)) * np.dtype(arr.dtype).itemsize
        row["dtypes"].add(str(np.dtype(arr.dtype)))


def summarize_params(params: Dict[str, Any], max_depth: int = -1) -> str:
    """Depth-limited parameter table for a flax params pytree.

    Returns a printable multi-line string: one row per module (aggregated
    at ``max_depth`` levels of nesting), with parameter count, in-memory
    size, and dtype, plus a totals footer.
    """
    rows: Dict[str, Dict[str, Any]] = {}
    _walk(params, [], rows, max_depth)
    name_w = max([len(k) for k in rows] + [len("module")]) + 2
    lines = [f"{'module':<{name_w}}{'params':>12}  {'size':>10}  dtype"]
    lines.append("-" * (name_w + 32))
    total_params = 0
    total_bytes = 0
    for key in sorted(rows):
        row = rows[key]
        total_params += row["params"]
        total_bytes += row["bytes"]
        lines.append(
            f"{key:<{name_w}}{row['params']:>12,}  {_human(row['bytes']):>10}  "
            + ",".join(sorted(row["dtypes"]))
        )
    lines.append("-" * (name_w + 32))
    lines.append(
        f"{'total':<{name_w}}{total_params:>12,}  {_human(total_bytes):>10}"
    )
    return "\n".join(lines)


def _human(n: int) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if n < 1024 or unit == "GB":
            return f"{n:.1f} {unit}" if unit != "B" else f"{n} B"
        n /= 1024.0
    return f"{n:.1f} GB"


# ---------------------------------------------------------------------------
# progress bar (reference configs/callbacks/rich_progress_bar.yaml)
# ---------------------------------------------------------------------------

class ProgressBar:
    """In-place single-line epoch progress on stderr.

    Throttled (default 4 updates/s) so the host-side write never paces the
    device. ``total`` may be None (unknown batch count on first epoch).
    Inert automatically on non-zero ranks under the multi-process runtime.
    """

    def __init__(self, enabled: bool = True, min_interval_s: float = 0.25,
                 stream=None):
        self.enabled = bool(enabled) and jax.process_index() == 0
        if stream is None:
            # auto-disable on non-interactive stderr (CI logs, piped runs)
            # unless the caller hands us an explicit stream
            stream = sys.stderr
            if self.enabled and not getattr(stream, "isatty", lambda: False)():
                self.enabled = False
        self.min_interval_s = float(min_interval_s)
        self.stream = stream
        self._t_start = 0.0
        self._t_last = 0.0
        self._wrote = False

    def start_epoch(self, epoch: int, total: Optional[int] = None) -> None:
        self._epoch = epoch
        self._total = total
        self._t_start = time.time()
        self._t_last = 0.0
        self._wrote = False

    def update(self, step_in_epoch: int, metrics: Optional[Dict[str, Any]] = None) -> None:
        if not self.enabled:
            return
        now = time.time()
        if now - self._t_last < self.min_interval_s:
            return
        self._t_last = now
        rate = step_in_epoch / max(now - self._t_start, 1e-9)
        frac = ""
        if self._total:
            frac = f"/{self._total} ({100.0 * step_in_epoch / self._total:3.0f}%)"
        line = f"epoch {self._epoch}: step {step_in_epoch}{frac}  {rate:5.1f} it/s"
        if metrics:
            # only cheap host floats here: callers pass already-fetched values
            shown = ", ".join(f"{k}={v:.4f}" for k, v in list(metrics.items())[:3])
            if shown:
                line += "  " + shown
        self.stream.write("\r" + line.ljust(79))
        self.stream.flush()
        self._wrote = True

    def end_epoch(self) -> None:
        if self.enabled and self._wrote:
            self.stream.write("\r" + " " * 79 + "\r")
            self.stream.flush()


# ---------------------------------------------------------------------------
# clear_cache (reference src/utils/clear_cache_cb.py)
# ---------------------------------------------------------------------------

def clear_device_caches(log=None, where: str = "") -> Dict[str, float]:
    """Free dead device buffers and report live-buffer stats.

    The reference's CudaClearCacheCallback calls ``torch.cuda.empty_cache()``
    at train/val boundaries because the CUDA caching allocator retains freed
    blocks. XLA has no retained-block allocator to flush; device buffers die
    with their last host reference. The analog: collect host garbage so
    dropped pytrees release HBM immediately, then report what's still live.
    Returns ``{"live_buffers": n, "live_mb": megabytes}`` (also logged when
    ``log`` is given).
    """
    gc.collect()
    n = 0
    total = 0
    for arr in jax.live_arrays():
        n += 1
        total += int(np.prod(arr.shape)) * np.dtype(arr.dtype).itemsize
    stats = {"live_buffers": float(n), "live_mb": total / (1024.0 * 1024.0)}
    if log is not None:
        log.info(
            f"clear_cache{f' ({where})' if where else ''}: "
            f"{n} live device buffers, {stats['live_mb']:.1f} MB"
        )
    return stats
