"""Multi-device (8-CPU virtual mesh) sharding tests.

SURVEY.md section 2.6/5.8: the reference's rayon shared-memory parallelism
maps to SPMD over a ``jax.sharding.Mesh``. These tests assert that the
sharded execution paths produce the SAME bits as single-device execution:
each internal point belongs to exactly one Schwarz domain (disjointness by
DDM construction), so the cross-device scatter-add only ever adds zeros to
a single contribution and f64 equality is exact.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import ferreus_rbf_tpu as frt
from ferreus_rbf_tpu.config import DDMParams, FmmCompressionType, FmmParams, Params
from ferreus_rbf_tpu.interpolant_config import (
    FittingAccuracy,
    FittingAccuracyType,
    InterpolantSettings,
    RBFKernelType,
)
from ferreus_rbf_tpu.ops.fmm.api import FmmTree
from ferreus_rbf_tpu.ops.kernels import KernelParams, KernelType
from ferreus_rbf_tpu.parallel import make_mesh, use_mesh
from ferreus_rbf_tpu.solver.ddm import DDMTree


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _points(n=1100, seed=7):
    rng = np.random.default_rng(seed)
    return rng.random((n, 3))


def _settings():
    return InterpolantSettings(
        kernel_type=RBFKernelType.ThinPlateSpline,  # linear drift -> QTAQ k>0
        fitting_accuracy=FittingAccuracy(1e-5, FittingAccuracyType.Relative),
    )


def _ddm_params():
    return DDMParams(
        leaf_threshold=128, overlap_quota=0.5, coarse_ratio=0.5, coarse_threshold=300
    )


def test_solve_bucket_sharded_matches_single_device():
    """Schwarz fine-level solves: "sp"-sharded buckets == unsharded, bitwise."""
    pts = _points()
    settings = _settings()
    settings.set_basis_size(3)

    ddm_plain = DDMTree(pts, settings, _ddm_params(), factor_dtype=jnp.float64)
    mesh = make_mesh(8, ("sp", "rhs"))
    with use_mesh(mesh):
        ddm_shard = DDMTree(pts, settings, _ddm_params(), factor_dtype=jnp.float64)
    assert ddm_shard._sp > 1  # the mesh was picked up

    rng = np.random.default_rng(11)
    residual = rng.standard_normal((pts.shape[0] + settings.basis_size, 2))

    for lvl in range(len(ddm_plain.levels) - 1):
        out_plain = np.asarray(ddm_plain.solve_fine_level(lvl, residual))
        out_shard = np.asarray(ddm_shard.solve_fine_level(lvl, residual))
        assert np.array_equal(out_plain, out_shard), f"level {lvl} diverged"


def test_matvec_fused_with_mesh_replicated_weights():
    """FMM fused matvec: mesh-replicated weights == plain weights, bitwise."""
    pts = _points(n=900, seed=3)
    kparams = KernelParams(KernelType.ThinPlateSplineRbf, base_range=1.0, total_sill=1.0)
    params = FmmParams(
        interpolation_order=4,
        max_points_per_cell=96,
        compression_type=FmmCompressionType.ACA,
        epsilon=1e-5,
    )
    tree = FmmTree(pts, 4, kparams, adaptive_tree=True, sparse=True, params=params)
    tree.prepare_targets(pts, "src")

    rng = np.random.default_rng(5)
    w = rng.standard_normal((pts.shape[0], 2))

    vals_plain = np.asarray(tree.evaluate_device(jnp.asarray(w), "src"))

    mesh = make_mesh(8, ("sp", "rhs"))
    w_repl = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P()))
    vals_mesh = np.asarray(tree.evaluate_device(w_repl, "src"))

    assert np.array_equal(vals_plain, vals_mesh)


def test_full_fit_sharded_matches_single_device():
    """End-to-end iterative fit under use_mesh == single-device fit."""
    pts = _points(n=1000, seed=9)
    vals = np.sin(3 * pts[:, 0]) * np.cos(2 * pts[:, 1]) + pts[:, 2] ** 2

    settings = _settings()
    params = Params(
        ddm_params=_ddm_params(),
        fmm_params=FmmParams(
            interpolation_order=4,
            max_points_per_cell=96,
            compression_type=FmmCompressionType.ACA,
            epsilon=1e-5,
        ),
        naive_solve_threshold=0,
        test_unique=False,
        mixed_precision=False,
        precond_factor_dtype="f64",
    )

    fit_plain = frt.RBFInterpolator(pts, vals, settings, params)

    mesh = make_mesh(8, ("sp", "rhs"))
    with use_mesh(mesh):
        fit_shard = frt.RBFInterpolator(pts, vals, settings, params)

    cp = fit_plain.coefficients.point_coefficients
    cs = fit_shard.coefficients.point_coefficients
    scale = np.max(np.abs(cp))
    assert np.max(np.abs(cp - cs)) <= 1e-12 * scale
    pp = fit_plain.coefficients.poly_coefficients
    ps = fit_shard.coefficients.poly_coefficients
    assert np.max(np.abs(pp - ps)) <= 1e-12 * max(np.max(np.abs(pp)), 1.0)

    # and the sharded fit actually interpolates
    resid = np.asarray(fit_shard.evaluate_at_source()).reshape(-1) - vals
    assert np.linalg.norm(resid) / np.linalg.norm(vals) < 1e-4
