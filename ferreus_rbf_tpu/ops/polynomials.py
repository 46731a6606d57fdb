"""Monomial / Lagrange polynomial bases for the drift term.

Maps ``ferreus_rbf/src/polynomials.rs``: monomial evaluation to degree <= 2
in scaled [-1, 1]^d coordinates, analytic monomial gradients, and Lagrange
coefficient construction from the special-point monomials.

Setup-time paths are numpy (host); ``evaluate_monomials_jnp`` provides the
same basis as a jittable device function for evaluation-time use.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _quadratic_pairs(d: int):
    return [(i, j) for i in range(d) for j in range(i, d)]


def evaluate_monomials(points, degree: int, basis_size: int, translation_factor, scale_factor):
    """Monomial matrix (N, basis_size): [1, x_0..x_{d-1}, x_i*x_j (i<=j)]."""
    pts = (np.asarray(points, np.float64) - translation_factor) / scale_factor
    n, d = pts.shape
    cols = [np.ones(n)]
    if degree >= 1:
        cols.extend(pts[:, i] for i in range(d))
    if degree == 2:
        cols.extend(pts[:, i] * pts[:, j] for i, j in _quadratic_pairs(d))
    out = np.stack(cols, axis=1)
    assert out.shape[1] == basis_size, (out.shape, basis_size)
    return out


def evaluate_monomials_jnp(points, degree: int, translation_factor, scale_factor):
    """Device-side monomial matrix, same layout as ``evaluate_monomials``."""
    pts = (jnp.asarray(points, jnp.float64) - jnp.asarray(translation_factor)) / jnp.asarray(
        scale_factor
    )
    n, d = pts.shape
    cols = [jnp.ones((n,), jnp.float64)]
    if degree >= 1:
        cols.extend(pts[:, i] for i in range(d))
    if degree == 2:
        cols.extend(pts[:, i] * pts[:, j] for i, j in _quadratic_pairs(d))
    return jnp.stack(cols, axis=1)


def evaluate_monomial_gradients(points, poly_coefficients, degree: int, translation_factor, scale_factor):
    """Gradient of the polynomial drift at each point.

    Returns (N, nrhs*d) with the reference's [rhs0_dx, rhs0_dy, ..., rhs1_dx]
    layout; derivatives account for the (x - t)/s scaling chain rule
    (``polynomials.rs:64-116``).
    """
    pts = (np.asarray(points, np.float64) - translation_factor) / scale_factor
    n, d = pts.shape
    coef = np.asarray(poly_coefficients, np.float64)
    nrhs = coef.shape[1]
    grads = np.zeros((n, nrhs * d))
    scale = np.asarray(scale_factor, np.float64)
    if degree >= 1:
        for rhs in range(nrhs):
            for dim in range(d):
                grads[:, rhs * d + dim] = coef[1 + dim, rhs] / scale[dim]
    if degree == 2:
        start = 1 + d
        for k, (i, j) in enumerate(_quadratic_pairs(d)):
            for rhs in range(nrhs):
                c = coef[start + k, rhs]
                if i == j:
                    grads[:, rhs * d + i] += c * 2.0 * pts[:, i] / scale[i]
                else:
                    grads[:, rhs * d + i] += c * pts[:, j] / scale[i]
                    grads[:, rhs * d + j] += c * pts[:, i] / scale[j]
    return grads


def evaluate_monomial_gradients_jnp(points, poly_coefficients, degree: int, translation_factor, scale_factor):
    """Device-side drift gradients, same layout as the numpy variant."""
    pts = (jnp.asarray(points, jnp.float64) - jnp.asarray(translation_factor)) / jnp.asarray(
        scale_factor
    )
    n, d = pts.shape
    coef = jnp.asarray(poly_coefficients, jnp.float64)
    nrhs = coef.shape[1]
    scale = jnp.asarray(scale_factor, jnp.float64)
    grads = jnp.zeros((n, nrhs, d), jnp.float64)
    if degree >= 1:
        lin = coef[1 : 1 + d, :] / scale[:, None]  # (d, nrhs)
        grads = grads + lin.T[None, :, :]
    if degree == 2:
        start = 1 + d
        for k, (i, j) in enumerate(_quadratic_pairs(d)):
            c = coef[start + k, :]  # (nrhs,)
            if i == j:
                grads = grads.at[:, :, i].add(c[None, :] * (2.0 * pts[:, i] / scale[i])[:, None])
            else:
                grads = grads.at[:, :, i].add(c[None, :] * (pts[:, j] / scale[i])[:, None])
                grads = grads.at[:, :, j].add(c[None, :] * (pts[:, i] / scale[j])[:, None])
    return grads.reshape(n, nrhs * d)


def get_lagrange_coefficients(monomials) -> np.ndarray:
    """Solve M @ L = I for the Lagrange basis coefficients (host)."""
    m = np.asarray(monomials, np.float64)
    return np.linalg.solve(m, np.eye(m.shape[0]))


def evaluate_lagrange_polynomials(monomials, lagrange_coefficients) -> np.ndarray:
    return np.asarray(monomials) @ np.asarray(lagrange_coefficients)
