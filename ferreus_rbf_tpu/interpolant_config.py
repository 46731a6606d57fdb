"""Kernel, drift, and fitting-accuracy configuration for RBF interpolants.

Mirrors ``ferreus_rbf/src/interpolant_config.rs`` field-for-field so a user of
the reference finds the same config surface (enum variants, defaults, the
``set_basis_size`` drift -> basis-count rule, and the minimum-drift-per-kernel
validation at ``interpolant_config.rs:45-52,229-264``).
"""

from __future__ import annotations

import dataclasses
import enum

from .ops.kernels import KernelParams, KernelType


class SpheroidalOrder(enum.Enum):
    Three = 3
    Five = 5
    Seven = 7
    Nine = 9


class Drift(enum.Enum):
    None_ = "None"
    Constant = "Constant"
    Linear = "Linear"
    Quadratic = "Quadratic"


class RBFKernelType(enum.Enum):
    Linear = "Linear"
    ThinPlateSpline = "ThinPlateSpline"
    Cubic = "Cubic"
    Spheroidal = "Spheroidal"


def get_min_drift(kernel: RBFKernelType) -> Drift:
    """Minimum required drift for conditional positive definiteness."""
    return {
        RBFKernelType.Linear: Drift.Constant,
        RBFKernelType.ThinPlateSpline: Drift.Linear,
        RBFKernelType.Cubic: Drift.Linear,
        RBFKernelType.Spheroidal: Drift.None_,
    }[kernel]


class FittingAccuracyType(enum.Enum):
    Relative = "Relative"
    Absolute = "Absolute"


@dataclasses.dataclass
class FittingAccuracy:
    """Solver stopping criterion (default: relative 1e-6)."""

    tolerance: float = 1e-6
    tolerance_type: FittingAccuracyType = FittingAccuracyType.Relative


_DRIFT_DEGREE = {
    Drift.None_: -1,
    Drift.Constant: 0,
    Drift.Linear: 1,
    Drift.Quadratic: 2,
}

_MIN_DEGREE = {
    RBFKernelType.Linear: 0,
    RBFKernelType.ThinPlateSpline: 1,
    RBFKernelType.Cubic: 1,
    RBFKernelType.Spheroidal: -1,
}


@dataclasses.dataclass
class InterpolantSettings:
    """Interpolant configuration (``interpolant_config.rs:179-264``).

    Construct with keyword args; ``basis_size``/``polynomial_degree`` are
    computed by ``set_basis_size`` when the interpolator is built. The drift
    defaults to the kernel's minimum required drift.
    """

    kernel_type: RBFKernelType
    spheroidal_order: SpheroidalOrder = SpheroidalOrder.Three
    drift: Drift | None = None
    nugget: float = 0.0
    base_range: float = 1.0
    total_sill: float = 1.0
    basis_size: int = 0
    polynomial_degree: int = -1
    fitting_accuracy: FittingAccuracy = dataclasses.field(default_factory=FittingAccuracy)

    def __post_init__(self):
        if self.drift is None:
            self.drift = get_min_drift(self.kernel_type)

    @classmethod
    def builder(cls, kernel_type: RBFKernelType) -> "InterpolantSettingsBuilder":
        return InterpolantSettingsBuilder(kernel_type)

    def set_basis_size(self, dimensions: int) -> None:
        """Compute polynomial basis count for the drift and dimensionality.

        Raises if the configured drift is below the kernel's minimum
        (mirrors the panic at ``interpolant_config.rs:262``).
        """
        poly_degree = _DRIFT_DEGREE[self.drift]
        min_degree = _MIN_DEGREE[self.kernel_type]
        if poly_degree < min_degree:
            raise ValueError(f"Min degree for kernel: {min_degree}")
        k = poly_degree + 1
        if poly_degree < 0:
            self.basis_size = 0
        elif dimensions == 1:
            self.basis_size = k
        elif dimensions == 2:
            self.basis_size = k * (k + 1) // 2
        elif dimensions == 3:
            self.basis_size = k * (k + 1) * (k + 2) // 6
        else:
            raise ValueError(f"Unsupported number of dimensions: {dimensions}")
        self.polynomial_degree = poly_degree

    def kernel_params(self) -> KernelParams:
        """InterpolantSettings -> KernelParams (``interpolant_config.rs:267-292``)."""
        if self.kernel_type == RBFKernelType.Linear:
            kt = KernelType.LinearRbf
        elif self.kernel_type == RBFKernelType.ThinPlateSpline:
            kt = KernelType.ThinPlateSplineRbf
        elif self.kernel_type == RBFKernelType.Cubic:
            kt = KernelType.CubicRbf
        else:
            kt = {
                SpheroidalOrder.Three: KernelType.Spheroidal3Rbf,
                SpheroidalOrder.Five: KernelType.Spheroidal5Rbf,
                SpheroidalOrder.Seven: KernelType.Spheroidal7Rbf,
                SpheroidalOrder.Nine: KernelType.Spheroidal9Rbf,
            }[self.spheroidal_order]
        return KernelParams(kernel_type=kt, base_range=self.base_range, total_sill=self.total_sill)

    # serialization -------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "kernel_type": self.kernel_type.value,
            "spheroidal_order": self.spheroidal_order.name,
            "drift": self.drift.value,
            "nugget": self.nugget,
            "base_range": self.base_range,
            "total_sill": self.total_sill,
            "basis_size": self.basis_size,
            "polynomial_degree": self.polynomial_degree,
            "fitting_accuracy": {
                "tolerance": self.fitting_accuracy.tolerance,
                "tolerance_type": self.fitting_accuracy.tolerance_type.value,
            },
        }

    @classmethod
    def from_dict(cls, d: dict) -> "InterpolantSettings":
        return cls(
            kernel_type=RBFKernelType(d["kernel_type"]),
            spheroidal_order=SpheroidalOrder[d["spheroidal_order"]],
            drift=Drift(d["drift"]),
            nugget=d["nugget"],
            base_range=d["base_range"],
            total_sill=d["total_sill"],
            basis_size=d["basis_size"],
            polynomial_degree=d["polynomial_degree"],
            fitting_accuracy=FittingAccuracy(
                tolerance=d["fitting_accuracy"]["tolerance"],
                tolerance_type=FittingAccuracyType(d["fitting_accuracy"]["tolerance_type"]),
            ),
        )


class InterpolantSettingsBuilder:
    """Fluent builder mirroring ``InterpolantSettingsBuilder``."""

    def __init__(self, kernel_type: RBFKernelType):
        self._settings = InterpolantSettings(kernel_type=kernel_type)

    def spheroidal_order(self, order: SpheroidalOrder):
        self._settings.spheroidal_order = order
        return self

    def drift(self, drift: Drift):
        self._settings.drift = drift
        return self

    def nugget(self, nugget: float):
        self._settings.nugget = nugget
        return self

    def base_range(self, base_range: float):
        self._settings.base_range = base_range
        return self

    def total_sill(self, total_sill: float):
        self._settings.total_sill = total_sill
        return self

    def fitting_accuracy(self, fitting_accuracy: FittingAccuracy):
        self._settings.fitting_accuracy = fitting_accuracy
        return self

    def build(self) -> InterpolantSettings:
        return dataclasses.replace(self._settings)
