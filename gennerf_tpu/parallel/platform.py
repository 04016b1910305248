"""Accelerator/platform selection shared by every CLI entry point.

The reference selects its backend through Lightning's ``trainer.accelerator``
(configs/trainer/{default,gpu,cpu,ddp,ddp_sim}.yaml); here the same config
key drives JAX platform choice, the compilation cache, virtual CPU device
provisioning, and — for multi-process runs (trainer.num_nodes > 1 or the
GENNERF_NUM_PROCESSES launcher env) — joining the jax.distributed
coordination service before any backend initializes.
"""
from __future__ import annotations

import os
from typing import Any, Dict


def probe_backend(timeout_s: float = 300.0):
    """Initialize the default JAX backend in a SUBPROCESS with a hard
    timeout; return its device count, or None if the backend is unhealthy.

    The tunneled TPU plugin can HANG (not fail) jax.devices() indefinitely
    when the tunnel is down, and a chip held by a concurrent process makes
    init raise — probing in-process would wedge or crash the caller. The
    generous timeout covers the documented multi-minute first-contact
    warm-up of a healthy tunnel. rc==0 AND the NDEV sentinel are both
    required so a crashing probe that happens to print a bare number is
    not misread as a healthy device count.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('NDEV', jax.device_count())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    for line in r.stdout.splitlines():
        parts = line.split()
        if len(parts) == 2 and parts[0] == "NDEV" and parts[1].isdigit():
            return int(parts[1])
    return None


def is_rank0() -> bool:
    """rank_zero_only gate shared by loggers/console/artifact writers:
    True unless a multi-process jax runtime reports a non-zero index
    (before any init, or on error, defaults to True)."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def select_platform(trainer_cfg: Dict[str, Any]) -> None:
    """Apply the trainer config's platform choices to this process.

    Must run before any JAX backend use (the platform and XLA_FLAGS are
    fixed at first backend initialization).
    """
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache"),
    )
    accel = trainer_cfg.get("accelerator", "auto")
    # multi-process runtime (reference DDP spawn / ddp_sim): join the
    # coordination service BEFORE any backend init. Triggered by
    # trainer.num_nodes > 1 or the GENNERF_NUM_PROCESSES env.
    num_nodes = int(trainer_cfg.get("num_nodes") or 1)
    env_procs = os.environ.get("GENNERF_NUM_PROCESSES")
    if num_nodes > 1 or (env_procs and int(env_procs) > 1):
        from .distributed import init_distributed

        init_distributed(
            coordinator_address=trainer_cfg.get("coordinator_address"),
            num_processes=num_nodes if num_nodes > 1 else None,
            process_id=(
                int(trainer_cfg["node_rank"])
                if trainer_cfg.get("node_rank") is not None
                else None
            ),
            platform="cpu" if accel == "cpu" else None,
            local_device_count=(
                int(trainer_cfg["devices"])
                if accel == "cpu" and isinstance(trainer_cfg.get("devices"), int)
                else None
            ),
        )
        return
    if accel == "cpu":
        devices = trainer_cfg.get("devices")
        if isinstance(devices, int) and devices > 1:
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={devices}"
                )
        jax.config.update("jax_platforms", "cpu")
