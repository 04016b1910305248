"""Device mesh + sharding helpers.

The reference scales via Lightning DDP / NCCL (configs/trainer/ddp.yaml);
here the equivalent is a 1-D `jax.sharding.Mesh` over the 'data' axis with
batch-sharded inputs under `jit`. Because jit programs have *global*
semantics, XLA inserts the gradient all-reduces (the DDP all-reduce) and
cross-device batch-norm statistics reductions (SyncBN) automatically —
there is no NCCL-style process-group code to write.

Dense decode shards the query-point axis the same way (embarrassingly
parallel — no collectives on the forward path at all).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` local devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Device-put a pytree of host arrays with axis 0 sharded over the mesh."""
    def put(x):
        spec = P(axis_name) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
