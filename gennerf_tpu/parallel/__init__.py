"""Device-mesh parallelism utilities."""
from .mesh import batch_spec, make_hybrid_mesh, make_mesh, replicate, shard_batch

__all__ = ["batch_spec", "make_hybrid_mesh", "make_mesh", "replicate", "shard_batch"]
