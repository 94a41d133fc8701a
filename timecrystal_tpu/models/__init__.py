"""Physical models (reference src/models/__init__.py:8-10).

``LongRangeKickedIsing`` is TPU-new: the interaction-range axis the
reference abstract advertises but never implements (models/long_range.py).
"""

from .kicked_ising import KickedIsingModel, make_floquet_gates, floquet_period
from .long_range import LongRangeKickedIsing

__all__ = ["KickedIsingModel", "make_floquet_gates", "floquet_period",
           "LongRangeKickedIsing"]
