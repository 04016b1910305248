"""TSDF data structure + fusion (reference src/data/tsdf.py equivalents)."""
from .tsdf import TSDF
from .fusion import TSDFFusion, FusionState, fuse_frames, init_state, integrate

__all__ = ["TSDF", "TSDFFusion", "FusionState", "fuse_frames", "init_state", "integrate"]
