"""Overlapping Schwarz preconditioner over the DDM hierarchy.

Maps ``ferreus_rbf/src/preconditioning/schwarz.rs``: restricted additive
Schwarz within each fine level (all leaf domains solved on the current
residual, only internal-point coefficients scattered back), multiplicative
between levels, with the coarse level smoothing after every fine level and
contributing the polynomial tail only on the last pass; fine-level
corrections are orthogonalised against the global thin-Q polynomial basis
so the P^T lambda = 0 constraint is preserved.

The leaf solves run as batched device Cholesky back-substitutions
(``ddm.py``); the residual updates are FMM matvecs restricted to the
level's point set.
"""

from __future__ import annotations

import numpy as np

from ..interpolant_config import InterpolantSettings
from .ddm import DDMTree


def schwarz_preconditioner(
    rg: np.ndarray,
    ddm_tree: DDMTree,
    matvec_partial,
    interpolant_settings: InterpolantSettings,
    ortho_poly_matrix: np.ndarray | None,
) -> np.ndarray:
    """Apply the multilevel Schwarz preconditioner to residual ``rg``.

    ``matvec_partial(weights, target_indices)`` computes the system operator
    restricted to the given target rows (full-size output, zeros elsewhere).
    """
    rg = np.asarray(rg, np.float64)
    sl = np.zeros_like(rg)
    coarse_idx = len(ddm_tree.levels) - 1
    coarse_indices = ddm_tree.levels[coarse_idx].point_indices

    if coarse_idx > 0:
        first = True
        for i in range(coarse_idx):
            level_indices = ddm_tree.levels[i].point_indices
            # matvec(0) == 0: skip the first restricted matvec
            res = rg if first else rg - matvec_partial(sl, level_indices)
            first = False
            sl = sl + _solve_fine_level(
                res, ddm_tree, i, interpolant_settings, ortho_poly_matrix
            )
            res = rg - matvec_partial(sl, coarse_indices)
            sl = sl + ddm_tree.solve_coarse(res, add_poly=(i == coarse_idx - 1))
    else:
        sl = sl + ddm_tree.solve_coarse(rg, add_poly=True)

    return sl


def _solve_fine_level(residuals, ddm_tree, level_idx, settings, ortho_poly_matrix):
    s1 = np.array(ddm_tree.solve_fine_level(level_idx, residuals))
    if settings.basis_size != 0:
        n = s1.shape[0] - settings.basis_size
        proj = ortho_poly_matrix.T @ s1[:n]
        s1[:n] -= ortho_poly_matrix @ proj
    return s1
