"""Analytic RBF test fields (maps ``ferreus_rbf/src/rbf_test_functions.rs``).

Franke's 2D function and the eight 3D test functions of Bozzini & Rossini
(2002), "Testing methods for 3D scattered data interpolation". All are
vectorised numpy; each returns an (N, 1) column to match the reference.
"""

from __future__ import annotations

import numpy as np


def _col(values: np.ndarray) -> np.ndarray:
    # the reference's test functions return 1-D arrays for scalar fields
    # (``python_bindings.rs:1255-1260`` via mat_to_numpy_scalar_or_matrix)
    return np.asarray(values, np.float64).reshape(-1)


class RBFTestFunctions:
    """Deterministic analytic fields used by tests and examples."""

    @staticmethod
    def franke_2d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        x, y = 9.0 * pts[:, 0], 9.0 * pts[:, 1]
        t1 = 0.75 * np.exp(-((x - 2.0) ** 2 + (y - 2.0) ** 2) / 4.0)
        t2 = 0.75 * np.exp(-((x + 1.0) ** 2) / 49.0 - ((y + 1.0) ** 2) / 10.0)
        t3 = 0.5 * np.exp(-((x - 7.0) ** 2 + (y - 3.0) ** 2) / 4.0)
        t4 = -0.2 * np.exp(-((x - 4.0) ** 2 + (y - 7.0) ** 2))
        return _col(t1 + t2 + t3 + t4)

    @staticmethod
    def f1_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        x, y, z = 9.0 * pts[:, 0], 9.0 * pts[:, 1], 9.0 * pts[:, 2]
        t1 = 0.75 * np.exp(-((x - 2.0) ** 2 + (y - 2.0) ** 2 + (z - 2.0) ** 2) / 4.0)
        t2 = 0.75 * np.exp(
            -((x + 1.0) ** 2) / 49.0 - ((y + 1.0) ** 2) / 10.0 - ((z + 1.0) ** 2) / 10.0
        )
        t3 = 0.5 * np.exp(-((x - 7.0) ** 2 + (y - 3.0) ** 2 + (z - 5.0) ** 2) / 4.0)
        t4 = -0.2 * np.exp(-((x - 4.0) ** 2 + (y - 7.0) ** 2 + (z - 5.0) ** 2))
        return _col(t1 + t2 + t3 + t4)

    @staticmethod
    def f2_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        return _col((np.tanh(9.0 * z - 9.0 * x - 9.0 * y) + 1.0) / 9.0)

    @staticmethod
    def f3_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        return _col(np.cos(6.0 * z) * (1.25 + np.cos(5.4 * y)) / (6.0 + 6.0 * (3.0 * x - 1.0) ** 2))

    @staticmethod
    def f4_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        r2 = ((pts - 0.5) ** 2).sum(axis=1)
        return _col(np.exp(-81.0 / 16.0 * r2) / 3.0)

    @staticmethod
    def f5_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        r2 = ((pts - 0.5) ** 2).sum(axis=1)
        return _col(np.exp(-81.0 / 4.0 * r2) / 3.0)

    @staticmethod
    def f6_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        r2 = ((pts - 0.5) ** 2).sum(axis=1)
        return _col(np.sqrt(64.0 - 81.0 * r2) / 9.0 - 0.5)

    @staticmethod
    def f7_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        r = np.sqrt((pts**2).sum(axis=1))
        return _col(1.0 / np.sqrt(1.0 + 2.0 * np.exp(-3.0 * (r - 6.7))))

    @staticmethod
    def f8_3d(points) -> np.ndarray:
        pts = np.asarray(points, np.float64)
        x, y = pts[:, 0], pts[:, 1]
        t1 = 50.0 * np.exp(-200.0 * ((x - 0.3) ** 2 + (y - 0.3) ** 2))
        t2 = np.exp(-50.0 * ((x - 0.5) ** 2 + (y - 0.5) ** 2))
        return _col(t1 + t2)

    @staticmethod
    def sphere_sdf(points, radius: float = 1.0, center=(0.0, 0.0, 0.0)) -> np.ndarray:
        """Signed distance to a sphere — the RMT golden-output field."""
        pts = np.asarray(points, np.float64)
        return _col(np.linalg.norm(pts - np.asarray(center), axis=1) - radius)
