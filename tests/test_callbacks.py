"""Callback analogs (reference configs/callbacks/*): model summary table,
progress bar, clear_cache device-buffer hygiene, and the config surface."""
import io
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gennerf_tpu.train.callbacks import (
    ProgressBar,
    clear_device_caches,
    summarize_params,
)

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def _params():
    return {
        "encoder": {
            "conv1": {"kernel": np.zeros((3, 3, 8, 16), np.float32)},
            "conv2": {"kernel": np.zeros((3, 3, 16, 16), np.float32),
                      "bias": np.zeros((16,), np.float32)},
        },
        "head": {"dense": {"kernel": np.zeros((16, 1), np.float32),
                           "bias": np.zeros((1,), np.float32)}},
    }


def test_summary_totals_and_depth():
    p = _params()
    full = summarize_params(p, max_depth=-1)
    total = 3 * 3 * 8 * 16 + 3 * 3 * 16 * 16 + 16 + 16 + 1
    assert f"{total:,}" in full
    # depth -1 keeps per-submodule rows
    assert "encoder/conv1" in full and "head/dense" in full
    # depth 1 aggregates to the top-level modules only
    top = summarize_params(p, max_depth=1)
    assert "encoder" in top and "head" in top
    assert "conv1" not in top
    assert f"{total:,}" in top
    assert "float32" in top


def test_summary_handles_bf16_and_root_leaves():
    p = {"w": jnp.zeros((4, 4), jnp.bfloat16)}
    out = summarize_params(p, max_depth=-1)
    assert "bfloat16" in out
    assert "16" in out  # 4*4 params


def test_progress_bar_writes_and_clears():
    buf = io.StringIO()
    bar = ProgressBar(enabled=True, min_interval_s=0.0, stream=buf)
    bar.start_epoch(3, total=10)
    bar.update(5, {"train_loss": 0.125})
    out = buf.getvalue()
    assert "epoch 3" in out and "step 5/10" in out and "train_loss=0.1250" in out
    bar.end_epoch()
    assert buf.getvalue().endswith("\r")  # line cleared in place


def test_progress_bar_disabled_is_silent():
    buf = io.StringIO()
    bar = ProgressBar(enabled=False, stream=buf)
    bar.start_epoch(0, total=2)
    bar.update(1)
    bar.end_epoch()
    assert buf.getvalue() == ""


def test_progress_bar_auto_disables_on_non_tty(monkeypatch):
    # default stream (stderr under pytest) is not a tty -> inert
    bar = ProgressBar(enabled=True)
    assert not bar.enabled


def test_clear_device_caches_reports_live_buffers():
    keep = jnp.ones((128, 128), jnp.float32)  # noqa: F841 — must stay live
    stats = clear_device_caches()
    assert stats["live_buffers"] >= 1
    assert stats["live_mb"] >= 128 * 128 * 4 / (1024 * 1024) * 0.99


@pytest.mark.parametrize("choice,expect", [
    ("none", {}),
    ("model_summary", {"model_summary": {"max_depth": 1}}),
    ("clear_cache", {"clear_cache": True}),
    ("rich_progress_bar", {"rich_progress_bar": True}),
])
def test_callbacks_config_groups(choice, expect):
    from gennerf_tpu.utils.config import compose

    cfg = compose(CONFIG_DIR, "train", [f"callbacks={choice}"])
    cb = cfg.get("callbacks") or {}
    for k, v in expect.items():
        assert cb.get(k) == v
    if choice != "none":
        # non-none groups inherit the default checkpoint block
        assert "model_checkpoint" in cb


def test_default_callbacks_match_reference_active_set():
    from gennerf_tpu.utils.config import compose

    cfg = compose(CONFIG_DIR, "train", [])
    cb = cfg["callbacks"]
    # reference configs/callbacks/default.yaml activates model_checkpoint +
    # rich_progress_bar + clear_cache (model_summary/early_stopping opt-in)
    assert cb["rich_progress_bar"] is True
    assert cb["clear_cache"] is True
    assert "model_checkpoint" in cb
    assert "model_summary" not in cb
