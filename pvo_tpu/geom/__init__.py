"""Geometry & optimization: projective ops, solvers, bundle adjustment."""

from . import ba, chol, projective  # noqa: F401
