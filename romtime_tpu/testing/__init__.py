"""Test support (reference: src/romtime/testing/__init__.py)."""

from .mock import MockSolver, MockSolverMoving

__all__ = ["MockSolver", "MockSolverMoving"]
