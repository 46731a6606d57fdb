"""Shared helpers for the example scripts."""

import os

import numpy as np

# The real-geology signed-distance dataset shipped with the reference
# (35,801 points: X, Y, Z, SignedDistance). Read from the reference mount
# when present; otherwise synthesise a comparable SD point cloud so the
# examples run standalone.
ALBATITE_CSV = os.environ.get(
    "ALBATITE_CSV", "/root/reference/datasets/albatite_SD_points.csv"
)


def load_albatite():
    from ferreus_rbf_tpu import csv_to_point_arrays

    if os.path.exists(ALBATITE_CSV):
        return csv_to_point_arrays(ALBATITE_CSV, has_headers=True)
    # fallback: signed distances to a lumpy closed surface
    rng = np.random.default_rng(42)
    n = 35_801
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bump = 1.0 + 0.15 * np.sin(4 * dirs[:, 0]) * np.cos(3 * dirs[:, 1])
    radii = rng.choice([0.75, 1.0, 1.25], size=n)
    pts = dirs * (bump * radii)[:, None] * 100.0
    sd = (radii - 1.0) * 100.0
    return pts, sd[:, None]
