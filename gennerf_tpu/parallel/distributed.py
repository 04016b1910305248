"""Multi-process distributed runtime.

The reference runs multi-process via Lightning DDP (NCCL spawn,
configs/trainer/ddp.yaml:4-11) and simulates it with 2 CPU processes
(trainer/ddp_sim.yaml:4-8). The JAX-native equivalent is
`jax.distributed.initialize`: every process joins a coordination service,
`jax.devices()` becomes the GLOBAL device list, and the same jit-global
programs the single-process path compiles now span hosts — XLA routes the
gradient all-reduce over ICI/DCN (TPU pods) or gloo (CPU simulation)
without any NCCL-style process-group code.

Entry surface (scripts/train.py):
  trainer.num_nodes > 1      -> init from env/config (below)
  GENNERF_NUM_PROCESSES env  -> same, without touching configs

Process topology comes from (env overrides config):
  GENNERF_COORDINATOR / trainer.coordinator_address  (host:port)
  GENNERF_NUM_PROCESSES / trainer.num_nodes
  GENNERF_PROCESS_ID / trainer.node_rank (or SLURM_PROCID / auto on TPU)

On real TPU pods `jax.distributed.initialize()` with NO arguments
auto-discovers everything from the TPU metadata — pass num_nodes > 1 with
no coordinator_address and that path is used.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    platform: Optional[str] = None,
    local_device_count: Optional[int] = None,
) -> None:
    """Join the multi-process runtime. Must run before ANY jax backend use.

    CPU simulation (the ddp_sim analog): pass platform='cpu' and
    local_device_count (virtual devices per process) — collectives ride
    gloo. TPU pods: leave everything None; the TPU runtime self-discovers.
    """
    env = os.environ
    coordinator_address = coordinator_address or env.get("GENNERF_COORDINATOR")
    if num_processes is None and env.get("GENNERF_NUM_PROCESSES"):
        num_processes = int(env["GENNERF_NUM_PROCESSES"])
    if process_id is None:
        for k in ("GENNERF_PROCESS_ID", "SLURM_PROCID"):
            if env.get(k) is not None:
                process_id = int(env[k])
                break

    if platform == "cpu":
        # the axon sitecustomize registers the TPU plugin before user code;
        # config-level forcing is the only reliable off-switch (conftest.py)
        jax.config.update("jax_platforms", "cpu")
        if local_device_count:
            jax.config.update("jax_num_cpu_devices", int(local_device_count))
        # cross-process CPU collectives need gloo (XLA's default CPU
        # backend has no inter-process transport)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    kwargs = {}
    if coordinator_address:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    if jax.process_count() > 1:
        _warmup_collectives()


def _warmup_collectives() -> None:
    """Form the cross-process collective transport (gloo contexts / DCN
    rendezvous) with a trivial all-reduce while the processes are still
    aligned from initialize().

    XLA's first-collective transport rendezvous runs under a short (~30 s)
    KV-store timeout, while each process first compiles the real step
    program independently — on a loaded host that compile skew alone can
    blow the window (observed: gloo `GetKeyValue() timed out` under a
    parallel test suite). A zero-cost psum over ALL global devices creates
    the full-clique context up front; the step program reuses it.
    """
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devs = np.asarray(jax.devices())
    mesh = Mesh(devs, ("d",))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec("d")),
        np.ones((jax.local_device_count(),), np.float32),
        (devs.size,),
    )
    jax.block_until_ready(jax.jit(lambda a: a.sum())(x))


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def local_batch_slice(global_batch_size: int) -> slice:
    """This process's slice of a globally-replicated host batch.

    Multi-process data feeding contract (parallel.mesh.shard_batch): every
    process decodes the SAME global batch (deterministic loader seed) and
    contributes rows [pi*k, (pi+1)*k) — the assembled global array is then
    identical to the single-process run, which is what the ddp_sim
    equivalence test asserts. Production multi-host loaders can instead
    decode only their slice and pass it with `already_local=True`.
    """
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} processes"
        )
    k = global_batch_size // n
    i = jax.process_index()
    return slice(i * k, (i + 1) * k)
