"""Offline evaluation: metrics + per-scene evaluation CLIs."""
from .metrics import eval_tsdf, eval_mesh, eval_depth

__all__ = ["eval_tsdf", "eval_mesh", "eval_depth"]
