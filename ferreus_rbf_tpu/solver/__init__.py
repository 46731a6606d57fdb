"""Solver layer: local domain solves, DDM hierarchy, Schwarz, FGMRES."""

from .domain import Domain

__all__ = ["Domain"]
