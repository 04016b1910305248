"""Geometry kernel library — the numerical core of gennerf_tpu.

Pure functions over static shapes: jit/vmap/grad-safe, arbitrarily
differentiable (the eikonal loss needs 2nd order through the gathers).
"""
from .coords import (
    coordinates,
    world_coordinates,
    grid_coordinates,
    corner_coordinates,
    normalize_coordinate,
    normalize_3d_coordinate,
    coordinate2index,
)
from .projection import (
    homogenize_projection,
    get_3d_points,
    depth_to_world,
    project_voxels,
    backproject,
)
from .interpolation import (
    grid_sample_2d,
    grid_sample_3d,
    trilinear_interpolation,
    sample_plane_feature,
)
from .sampling import (
    sample_pixels,
    sample_valid_depth_pixels,
    sample_valid_pixels,
    sample_valid_pixels_masked,
    sample_points_in_frustum,
    sample_points_on_rays,
    sample_points_from_bounding_box,
    farthest_point_sample,
    bounds_pc_batch,
)
from .scatter import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_count,
    scatter_to_plane,
    pool_and_gather,
)
from .value_transforms import (
    log_transform,
    smooth_log_transform,
    gaussian_kernel_1d,
    apply_gaussian_smoothing,
)
from .normals import estimate_pointcloud_normals

__all__ = [k for k in dir() if not k.startswith("_")]
