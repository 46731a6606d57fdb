"""Dense kernel matrix builders (maps ``ferreus_rbf_utils/src/utils.rs:288-349,496-538``).

These are the "naive path" building blocks: the full A matrix for small
problems, direct solves, and the correctness oracle the FMM is tested
against. They are single fused XLA computations — the pairwise r^2 tensor is
formed by one broadcasted subtract + contraction and phi is applied
elementwise, which XLA fuses; chunked variants keep memory bounded for big
inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .kernels import Kernel, KernelParams, make_kernel


def get_a_matrix(target_points, source_points, params: KernelParams, xp=jnp):
    """A[i, j] = phi(|t_i - s_j|). Shape (M, N)."""
    kernel = make_kernel(params, xp)
    return kernel.pair(target_points, source_points)


def get_a_matrix_symmetric_solver(points, params: KernelParams, nugget: float = 0.0, xp=jnp):
    """Symmetric A at a single point set with nugget added on the diagonal.

    Maps ``get_a_matrix_symmetric_solver`` from the reference registry macro
    (``utils.rs:496-538``): A + nugget*I over the source points.
    """
    kernel = make_kernel(params, xp)
    a = kernel.pair(points, points)
    n = a.shape[0]
    return a + nugget * xp.eye(n, dtype=a.dtype)


def dense_matvec(kernel: Kernel, targets, sources, weights, chunk: int = 8192):
    """y = K @ w without materialising K, chunked over targets.

    ``weights`` is (N, nrhs); returns (M, nrhs). The correctness oracle for
    FMM matvec equivalence tests at sizes where (M, N) doesn't fit.
    """
    targets = jnp.asarray(targets, jnp.float64)
    sources = jnp.asarray(sources, jnp.float64)
    weights = jnp.asarray(weights, jnp.float64)

    @jax.jit
    def _block(t_block):
        k = kernel.pair(t_block, sources)
        return k @ weights

    m = targets.shape[0]
    out = []
    for start in range(0, m, chunk):
        out.append(_block(targets[start : start + chunk]))
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def dense_matvec_with_gradients(kernel: Kernel, targets, sources, weights, chunk: int = 4096):
    """(y, g) with g[i, rhs*D + d] = sum_j w[j, rhs] * d phi/d t_d (t_i - s_j).

    Gradient column layout matches the reference
    (``bbfmm.rs:434,557-559``): [rhs0_dx, rhs0_dy, rhs0_dz, rhs1_dx, ...].
    """
    targets = jnp.asarray(targets, jnp.float64)
    sources = jnp.asarray(sources, jnp.float64)
    weights = jnp.asarray(weights, jnp.float64)
    dims = targets.shape[1]
    nrhs = weights.shape[1]

    @jax.jit
    def _block(t_block):
        k, g = kernel.pair_with_grad(t_block, sources)
        vals = k @ weights
        # g: (m, n, d); weights: (n, nrhs) -> (m, nrhs, d)
        grads = jnp.einsum("mnd,nr->mrd", g, weights)
        return vals, grads.reshape(t_block.shape[0], nrhs * dims)

    m = targets.shape[0]
    vals_out, grads_out = [], []
    for start in range(0, m, chunk):
        v, g = _block(targets[start : start + chunk])
        vals_out.append(v)
        grads_out.append(g)
    if len(vals_out) == 1:
        return vals_out[0], grads_out[0]
    return jnp.concatenate(vals_out, axis=0), jnp.concatenate(grads_out, axis=0)


def get_pointarray_extents(points) -> np.ndarray:
    """AABB extents ``[min_0..min_{d-1}, max_0..max_{d-1}]`` (``utils.rs:23``)."""
    pts = np.asarray(points, np.float64)
    return np.concatenate([pts.min(axis=0), pts.max(axis=0)])
