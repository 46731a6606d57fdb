"""Host-side helpers (maps ``ferreus_rbf/src/common.rs``).

All of these run at *setup time* on the host in numpy: random points, AABB
extents, CSV I/O, evaluation grids, farthest-point sampling, and the
Chebyshev-cube scaling factors used by the polynomial drift basis. None of
them sit on the device hot path.
"""

from __future__ import annotations

import csv as _csv

import numpy as np


def generate_random_points(n: int, d: int, seed: int | None = None) -> np.ndarray:
    """Uniform random points in [0, 1)^d; deterministic when seeded."""
    rng = np.random.default_rng(seed)
    return rng.random((n, d), dtype=np.float64)


def get_pointarray_extents(points) -> np.ndarray:
    """AABB extents ``[min_0..min_{d-1}, max_0..max_{d-1}]``."""
    pts = np.asarray(points, np.float64)
    return np.concatenate([pts.min(axis=0), pts.max(axis=0)])


def union_extents(a, b) -> np.ndarray:
    """Union of two extent vectors (mins then maxs)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape != b.shape or a.size % 2 != 0:
        raise ValueError("extent vectors must have the same even length")
    d = a.size // 2
    return np.concatenate([np.minimum(a[:d], b[:d]), np.maximum(a[d:], b[d:])])


def pad_and_snap_extents(initial_extents, resolution: float, buffer: float) -> np.ndarray:
    """Snap extents to the resolution grid, then pad by one cell + buffer.

    Mirrors ``common.rs:73-103``; accepts 2D (len 4) or 3D (len 6) extents in
    interleaved [mins..., maxs...] layout.
    """
    extents = np.asarray(initial_extents, np.float64).copy()
    if extents.size not in (4, 6):
        raise ValueError(f"Expected extents of length 4 (2D) or 6 (3D), got {extents.size}")
    d = extents.size // 2
    extents[:d] = np.floor(extents[:d] / resolution) * resolution - resolution - buffer
    extents[d:] = np.ceil(extents[d:] / resolution) * resolution + resolution + buffer
    return extents


def create_evaluation_grid(ranges, counts) -> np.ndarray:
    """Regular grid, one row per point; first dimension varies fastest.

    Matches the ordering of ``common.rs:113-133``.
    """
    if len(ranges) != len(counts):
        raise ValueError("ranges and counts must have the same length")
    axes = [np.linspace(lo, hi, c) for (lo, hi), c in zip(ranges, counts)]
    mesh = np.meshgrid(*axes, indexing="ij")
    # first column varies fastest -> reverse stacking order then transpose
    cols = [m.reshape(-1, order="F") for m in mesh]
    return np.stack(cols, axis=1)


def csv_to_point_arrays(file_path: str, has_headers: bool = True):
    """Load a CSV: last column is the value, preceding columns the point."""
    with open(file_path, newline="") as fh:
        reader = _csv.reader(fh)
        rows = list(reader)
    if has_headers:
        rows = rows[1:]
    data = np.asarray(rows, dtype=np.float64)
    return data[:, :-1], data[:, -1:]


def point_arrays_to_csv(points, values, filename: str) -> None:
    """Write points + values with the reference's header convention."""
    points = np.asarray(points)
    values = np.asarray(values).reshape(points.shape[0], -1)
    with open(filename, "w", newline="") as fh:
        writer = _csv.writer(fh)
        writer.writerow(["X", "Y", "Z", "InterpolatedValue"])
        for p, v in zip(points, values):
            writer.writerow([*p, *v])


def farthest_point_sampling(points, num_wanted_points: int, seed_index: int) -> np.ndarray:
    """Greedy max-min-distance sampling starting at ``seed_index``.

    Vectorised version of ``common.rs:246-287``: one distance update per
    selected point, O(k*N).
    """
    pts = np.asarray(points, np.float64)
    n = pts.shape[0]
    k = min(num_wanted_points, n)
    selected = np.empty(k, dtype=np.int64)
    selected[0] = seed_index
    min_dists = np.full(n, np.inf)
    is_selected = np.zeros(n, dtype=bool)
    is_selected[seed_index] = True
    last = seed_index
    for i in range(1, k):
        d = np.linalg.norm(pts - pts[last], axis=1)
        np.minimum(min_dists, d, out=min_dists)
        masked = np.where(is_selected, -1.0, min_dists)
        last = int(np.argmax(masked))
        selected[i] = last
        is_selected[last] = True
    return selected


def get_cheb_cube_scaling_factors(point_locations):
    """Per-dim (translation, scale) mapping points into [-1, 1]^d.

    Translation = range midpoint, scale = half range (zeros -> 1.0), as in
    ``common.rs:299-320``.
    """
    pts = np.asarray(point_locations, np.float64)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    translation = (hi + lo) / 2.0
    scale = (hi - lo) / 2.0
    scale[scale == 0.0] = 1.0
    return translation, scale


def scale_points(points, translation_factor, scale_factor):
    """(x - translation) / scale, elementwise per dimension."""
    return (np.asarray(points, np.float64) - translation_factor) / scale_factor


def get_centroid(points) -> np.ndarray:
    return np.asarray(points, np.float64).mean(axis=0)


def bounding_box_corners(mins, maxs) -> np.ndarray:
    """All 2^d corners of an AABB (corner i uses max_j iff bit j of i set)."""
    mins = np.asarray(mins, np.float64)
    maxs = np.asarray(maxs, np.float64)
    d = mins.size
    n = 1 << d
    corners = np.empty((n, d))
    for i in range(n):
        for j in range(d):
            corners[i, j] = maxs[j] if (i >> j) & 1 else mins[j]
    return corners
