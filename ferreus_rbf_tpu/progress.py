"""Progress reporting (maps ``ferreus_rbf/src/progress.rs`` + RMT stages).

The observability layer of the framework: typed progress events emitted from
the solver hot loop (per-iteration residual stream) and the isosurfacer
(stage + fraction). In Python the sink is simply a callable; ``Progress``
wraps a user callback the way the PyO3 ``Progress`` class does
(``py_ferreus_rbf/src/python_bindings.rs:282-397``) and ``closure_sink``
mirrors the channel-based Rust helper with a plain synchronous adapter.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Callable, Optional, Union


class IsosurfaceStage(enum.Enum):
    """Coarse stages of an isosurface extraction (RMT ``progress.rs:19-49``)."""

    ProjectingSeeds = "Projecting seeds"
    ExpandingWavefront = "Expanding wavefront"
    ClusteringVertices = "Clustering vertices"
    BuildingFacets = "Building facets"
    CleaningMesh = "Cleaning mesh"
    BoundaryClosure = "Boundary closure"
    Finished = "Finished"

    def __str__(self) -> str:  # human-readable name
        return self.value


@dataclasses.dataclass
class DuplicatesRemoved:
    num_duplicates: int


@dataclasses.dataclass
class SolverIteration:
    iter: int
    residual: float
    progress: float


@dataclasses.dataclass
class SurfacingProgress:
    isovalue: float
    stage: str
    progress: float


@dataclasses.dataclass
class Message:
    message: str


ProgressMsg = Union[DuplicatesRemoved, SolverIteration, SurfacingProgress, Message]


class Progress:
    """Progress sink wrapping a user callback ``f(msg: ProgressMsg)``."""

    def __init__(self, callback: Callable[[ProgressMsg], None]):
        self._callback = callback

    def emit(self, msg: ProgressMsg) -> None:
        self._callback(msg)


def closure_sink(buffer: int, handler: Callable[[ProgressMsg], None]):
    """Create a sink that invokes ``handler`` for each message.

    Returns ``(sink, None)`` — the Rust version spawns a listener thread for
    its mpsc channel; in Python delivery is synchronous so there is no join
    handle.
    """
    return Progress(handler), None


def emit(sink: Optional[Progress], msg: ProgressMsg) -> None:
    """Emit to an optional sink (no-op when absent)."""
    if sink is not None:
        sink.emit(msg)


def progress_from_rel(current_res: float, start_res: float, target_res: float) -> float:
    """Log-scale solve progress in [0, 1] (``progress.rs:124-130``)."""
    if current_res <= target_res:
        return 1.0
    return (math.log10(start_res) - math.log10(current_res)) / (
        math.log10(start_res) - math.log10(target_res)
    )
