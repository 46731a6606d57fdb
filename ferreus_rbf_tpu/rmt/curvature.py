"""Curvature-weighted vertex clustering (Treece et al. section 3.4).

Maps ``ferreus_rmt/src/curvature_weighting.rs``: for each intersected edge,
each calculation plane around it yields theta_b/theta_c via Equation (1),
alpha = |theta_b| + |theta_c| (Eq. 2); a local normal estimate from the
cot-weighted perpendiculars orients alpha into beta (Eq. 3), and the edge's
clustering weight is 1/tan(beta/2) (Eq. 4), clamped. The cluster vertex is
the weight-averaged crossing point.
"""

from __future__ import annotations

import numpy as np

from .constants import (
    EDGE_DELTAS,
    NEIGHBOUR_EDGE_PLANE_PAIRS,
    NEIGHBOUR_EDGE_PLANE_PHIS,
)
from .isosurface_util import edge_intersection_point, get_edge_owner

_EPS = 1e-12
_MAX_COT_THETA = 1e12
_MAX_CURVATURE_WEIGHT = 1e12


def _unit(v):
    n = np.linalg.norm(v)
    if n <= _EPS:
        return None
    return v / n


def curvature_weight_for_edge(owner, other, edge_id, evaluated, lattice):
    do_ = evaluated.get(owner)
    da = evaluated.get(other)
    if do_ is None or da is None or not np.isfinite(do_) or not np.isfinite(da):
        return None

    pairs = NEIGHBOUR_EDGE_PLANE_PAIRS[edge_id]
    phis = NEIGHBOUR_EDGE_PLANE_PHIS[edge_id]

    o_world = lattice.ijk_to_world(np.asarray(owner, np.float64))
    a_world = lattice.ijk_to_world(np.asarray(other, np.float64))
    oa = a_world - o_world
    oa_len = np.linalg.norm(oa)
    if oa_len <= _EPS:
        return None
    oa_hat = oa / oa_len

    plane_alphas = []
    plane_axes = []
    projection_sum = np.zeros(3)

    for pair, phi_pair in zip(pairs, phis):
        perp_dirs = []
        thetas = []
        cot_thetas = []
        for side in range(2):
            nbr_edge = pair[side]
            phi = phi_pair[side]
            d = EDGE_DELTAS[nbr_edge]
            nbr = (owner[0] + int(d[0]), owner[1] + int(d[1]), owner[2] + int(d[2]))
            db = evaluated.get(nbr)
            if db is None or not np.isfinite(db):
                return None
            b_world = lattice.ijk_to_world(np.asarray(nbr, np.float64))
            ob = b_world - o_world
            ob_len = np.linalg.norm(ob)
            if ob_len <= _EPS:
                return None
            ob_perp = ob - oa_hat * (ob @ oa_hat)
            ob_perp_dir = _unit(ob_perp)
            if ob_perp_dir is None:
                return None

            # Equation (1)
            denominator = (do_ - da) * ob_len
            if abs(denominator) <= _EPS:
                return None
            ratio = ((do_ - db) * oa_len) / denominator
            divisor = ratio - np.cos(phi)
            if abs(divisor) <= _EPS:
                theta = -np.pi / 2 if divisor < 0 or (divisor == 0 and np.signbit(divisor)) else np.pi / 2
            else:
                theta = np.arctan(np.sin(phi) / divisor)
            tan_theta = np.tan(theta)
            cot = (
                np.copysign(_MAX_COT_THETA, theta)
                if abs(tan_theta) <= _EPS
                else 1.0 / tan_theta
            )
            perp_dirs.append(ob_perp_dir)
            thetas.append(theta)
            cot_thetas.append(cot)

        # Equation (2)
        alpha = abs(thetas[0]) + abs(thetas[1])
        axis = _unit(perp_dirs[0] - perp_dirs[1])
        if axis is None:
            axis = perp_dirs[0]
        plane_alphas.append(alpha)
        plane_axes.append(axis)
        projection_sum += perp_dirs[0] * cot_thetas[0] + perp_dirs[1] * cot_thetas[1]

    scale = 2.0 / 3.0 if len(plane_alphas) == 3 else 1.0
    n_est = _unit(oa_hat + projection_sum * scale)
    if n_est is None:
        return None

    min_abs_tan_half_beta = np.inf
    for alpha, axis in zip(plane_alphas, plane_axes):
        axis_u = _unit(axis)
        if axis_u is None:
            return None
        sin_gamma = min(max(abs(n_est @ axis_u), 0.0), 1.0)
        gamma = np.arcsin(sin_gamma)
        cos_gamma = np.cos(gamma)
        one_minus_cg2 = 1.0 - cos_gamma * cos_gamma
        sin_half_alpha = abs(np.sin(0.5 * alpha))
        if sin_half_alpha <= _EPS:
            beta = 0.0
        else:
            curvature_term = 1.0 / (sin_half_alpha * sin_half_alpha) - 1.0  # Eq. (3)
            if curvature_term < 0.0:
                return None
            inv_tan2 = one_minus_cg2 * curvature_term
            if inv_tan2 <= _EPS:
                continue
            beta = 2.0 * np.arctan(1.0 / np.sqrt(inv_tan2))
        min_abs_tan_half_beta = min(min_abs_tan_half_beta, abs(np.tan(0.5 * beta)))

    if not np.isfinite(min_abs_tan_half_beta):
        return None
    if min_abs_tan_half_beta <= _EPS:
        return _MAX_CURVATURE_WEIGHT
    return min(1.0 / min_abs_tan_half_beta, _MAX_CURVATURE_WEIGHT)  # Eq. (4)


def curvature_weighted_cluster_point(edge_endpoints, evaluated, lattice):
    """Weight-averaged cluster vertex; None if no usable weights."""
    weighted = np.zeros(3)
    total = 0.0
    for u, v in edge_endpoints:
        p = edge_intersection_point(u, v, evaluated, lattice)
        if p is None:
            continue
        own = get_edge_owner(u, v)
        if own is None:
            continue
        owner, other, eid = own
        w = curvature_weight_for_edge(owner, other, eid, evaluated, lattice)
        if w is None:
            w = 1.0
        weighted += np.asarray(p) * w
        total += w
    if total <= _EPS:
        return None
    return tuple(weighted / total)
