"""Time evolution algorithms: TEBD, TDVP, open systems.

Reference src/dynamics/__init__.py:1-10 exposes TEBDEvolution; CustomFloquet
is imported directly by the application layer (reference main.py:37).
"""

from .tebd import CustomFloquet, TEBDEvolution, NearestNeighborModel, spin_chain_model
from .ground_state import find_ground_state, imaginary_time_scan

__all__ = ["TEBDEvolution", "CustomFloquet", "NearestNeighborModel",
           "spin_chain_model", "find_ground_state", "imaginary_time_scan"]
