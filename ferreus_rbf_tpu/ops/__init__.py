"""Compute ops: kernels, dense kernel matrices, polynomial bases, FMM."""

from .kernels import (
    Kernel,
    KernelParams,
    KernelType,
    SPHEROIDAL_CONSTANTS,
    SpheroidalConstants,
    kernel_phi,
    make_kernel,
)
from .dense import get_a_matrix, get_a_matrix_symmetric_solver

__all__ = [
    "Kernel",
    "KernelParams",
    "KernelType",
    "SPHEROIDAL_CONSTANTS",
    "SpheroidalConstants",
    "get_a_matrix",
    "get_a_matrix_symmetric_solver",
    "kernel_phi",
    "make_kernel",
]
