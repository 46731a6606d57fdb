"""Shared helpers: point generation, extents, CSV I/O, scaling, sampling."""

from .common import (
    create_evaluation_grid,
    csv_to_point_arrays,
    farthest_point_sampling,
    generate_random_points,
    get_cheb_cube_scaling_factors,
    get_pointarray_extents,
    pad_and_snap_extents,
    point_arrays_to_csv,
    scale_points,
    union_extents,
)

__all__ = [
    "create_evaluation_grid",
    "csv_to_point_arrays",
    "farthest_point_sampling",
    "generate_random_points",
    "get_cheb_cube_scaling_factors",
    "get_pointarray_extents",
    "pad_and_snap_extents",
    "point_arrays_to_csv",
    "scale_points",
    "union_extents",
]
