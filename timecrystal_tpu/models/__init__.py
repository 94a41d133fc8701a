"""Physical models (reference src/models/__init__.py:8-10)."""

from .kicked_ising import KickedIsingModel, make_floquet_gates, floquet_period

__all__ = ["KickedIsingModel", "make_floquet_gates", "floquet_period"]
