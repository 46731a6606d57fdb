"""ferreus_rbf_tpu: TPU-native fast global RBF interpolation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``graphic-goose/ferreus_rbf_rs`` (Rust reference): O(N log N) black-box fast
multipole (BBFMM) kernel summation, FGMRES + multilevel overlapping
additive-Schwarz domain-decomposition solves of the dense symmetric RBF
system, and surface-following regularised marching tetrahedra isosurface
extraction — engineered TPU-first:

* the octree is a *level-batched padded array* structure built on the host and
  shipped to the device as a static pytree (no hashmaps in the compute path),
* every FMM pass (P2M/M2M/M2L/L2L/P2P/M2P/P2L/L2P) is a batched einsum /
  matmul that maps onto the MXU, with multi-RHS blocking throughout,
* the iterative solver's hot loop runs as jitted device code; setup-time
  combinatorics (tree build, domain decomposition, pivoted QR) stay on the
  host where they belong,
* multi-chip scaling uses ``jax.sharding`` meshes (RHS- and cell-sharding),
  not a message-passing port.

All numerics are float64 (the reference is f64 end-to-end, and interpolation
parity to ~1e-8 requires it), so x64 mode is enabled at import.
"""

import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)
# True-f32 matmuls: the TPU MXU lowers f32 dots to bf16 passes by default
# (~1e-3 relative error), which would defeat the mixed-precision solver's
# f32 inner iterations. "highest" forces full f32 accumulation.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: XLA compiles of the f64 FMM programs are
# expensive on TPU backends; caching them on disk makes every process after
# the first start warm.
_cache_dir = _os.environ.get(
    "FERREUS_RBF_TPU_JAX_CACHE",
    _os.path.expanduser("~/.cache/ferreus_rbf_tpu_jax"),
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # Cache EVERY program: on tunneled/remote runtimes even sub-second
    # compiles cost an HTTP round trip with seconds of variance, so the
    # usual "don't cache trivial programs" heuristic is wrong here.
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .interpolant_config import (  # noqa: E402
    Drift,
    FittingAccuracy,
    FittingAccuracyType,
    InterpolantSettings,
    RBFKernelType,
    SpheroidalOrder,
    get_min_drift,
)
from .config import (  # noqa: E402
    DDMParams,
    FmmCompressionType,
    FmmParams,
    Params,
    Solvers,
)
from .models.rbf import Coefficients, RBFInterpolator  # noqa: E402
from .models.global_trend import GlobalTrend, GlobalTrendTransform  # noqa: E402
from .models.test_functions import RBFTestFunctions  # noqa: E402
from .utils.common import (  # noqa: E402
    create_evaluation_grid,
    csv_to_point_arrays,
    generate_random_points,
    pad_and_snap_extents,
    point_arrays_to_csv,
)
from .progress import (  # noqa: E402
    Progress,
    ProgressMsg,
    closure_sink,
)
from .isosurfacing import BoundaryClosure, ClusterMethod, Mesh  # noqa: E402

__all__ = [
    "BoundaryClosure",
    "ClusterMethod",
    "Coefficients",
    "DDMParams",
    "Drift",
    "FittingAccuracy",
    "FittingAccuracyType",
    "FmmCompressionType",
    "FmmParams",
    "GlobalTrend",
    "GlobalTrendTransform",
    "InterpolantSettings",
    "Mesh",
    "Params",
    "Progress",
    "ProgressMsg",
    "RBFInterpolator",
    "RBFKernelType",
    "RBFTestFunctions",
    "Solvers",
    "SpheroidalOrder",
    "closure_sink",
    "create_evaluation_grid",
    "csv_to_point_arrays",
    "generate_random_points",
    "get_min_drift",
    "pad_and_snap_extents",
    "point_arrays_to_csv",
]

__version__ = "0.1.0"
