"""Iterative fit orchestration: FMM matvec + DDM/Schwarz + FGMRES.

Maps the large-N branch of ``rbf.rs::setup_and_solve`` (``rbf.rs:456-576``)
and the implicit saddle-point operator ``fast_matrix_vector_product``
(``rbf.rs:1338-1379``): the action of [[A + nu*I, P], [P^T, 0]] is computed
as (FMM matvec at the source points) + nugget*w + P c, with the constraint
block handled by the preconditioner's orthogonalisation; the system is
solved per RHS column with restarted FGMRES (20 x 5) or the stationary DDM
iteration, both right-preconditioned by the multilevel Schwarz hierarchy.
"""

from __future__ import annotations

import numpy as np

from ..config import Solvers
from ..ops.fmm.api import FmmTree
from ..ops.polynomials import evaluate_monomials
from . import fgmres as solvers
from .ddm import DDMTree
from .schwarz import schwarz_preconditioner


def iterative_fit(rbfi):
    """Fit ``rbfi`` (an RBFInterpolator mid-construction) iteratively.

    Returns a ``Coefficients``-compatible object; the caller splits nothing —
    splitting into point/poly parts happens here.
    """
    from ..models.rbf import Coefficients

    points = rbfi.points
    values = rbfi.point_values
    settings = rbfi.interpolant_settings
    params = rbfi.params
    n, _d = points.shape
    m = settings.basis_size
    num_cols = values.shape[1]

    fmm_tree = FmmTree(
        points,
        params.fmm_params.interpolation_order,
        settings.kernel_params(),
        adaptive_tree=True,
        sparse=True,
        params=params.fmm_params,
    )

    monomial_matrix = None
    ortho_poly = None
    rhs = values
    if m != 0:
        monomial_points = (
            rbfi.global_trend.inverse_transform_points(points)
            if rbfi.global_trend is not None
            else points
        )
        monomial_matrix = evaluate_monomials(
            monomial_points,
            settings.polynomial_degree,
            m,
            rbfi.translation_factor,
            rbfi.scale_factor,
        )
        ortho_poly, _ = np.linalg.qr(monomial_matrix)
        rhs = np.concatenate([values, np.zeros((m, num_cols))])

    ddm_tree = DDMTree(
        points, settings, params.ddm_params, rbfi.global_trend
    )

    nugget = settings.nugget

    def matvec_partial(weights, target_indices=None):
        w = np.asarray(weights, np.float64).reshape(-1, 1)
        wp = w[:n]
        fmm_tree.set_weights(wp)
        if target_indices is None:
            targets = points
            key = "__all__"
            idx = None
        else:
            idx = np.asarray(target_indices, np.int64)
            targets = points[idx]
            key = ("lvl", idx.shape[0], int(idx[0]) if idx.size else -1)
        vals = fmm_tree.evaluate(wp, targets, reuse_key=key)
        result = np.zeros_like(w)
        if idx is None:
            result[:n] = vals + nugget * wp
            if monomial_matrix is not None:
                result[:n] += monomial_matrix @ w[n:]
        else:
            result[idx] = vals + nugget * wp[idx]
            if monomial_matrix is not None:
                result[idx] += monomial_matrix[idx] @ w[n:]
        return result

    def matvec(weights):
        return matvec_partial(weights, None)

    def precon(residuals):
        return schwarz_preconditioner(
            np.asarray(residuals, np.float64).reshape(-1, 1),
            ddm_tree,
            matvec_partial,
            settings,
            ortho_poly,
        )

    point_coefficients = np.zeros((n, num_cols))
    poly_coefficients = np.zeros((m, num_cols)) if m else None

    for col in range(num_cols):
        if params.solver_type == Solvers.FGMRES:
            sol = solvers.fgmres(
                matvec,
                rhs[:, col : col + 1],
                m=precon,
                x0=None,
                max_outer_iterations=20,
                max_inner_iterations=5,
                tolerance=settings.fitting_accuracy,
                callback=rbfi.progress_callback,
            )
        else:
            sol = solvers.schwarz_ddm_solver(
                matvec,
                rhs[:, col : col + 1],
                m=precon,
                max_iterations=100,
                tolerance=settings.fitting_accuracy,
                callback=rbfi.progress_callback,
            )
        point_coefficients[:, col] = sol[:n, 0]
        if m:
            poly_coefficients[:, col] = sol[n:, 0]

    return Coefficients(point_coefficients, poly_coefficients)
