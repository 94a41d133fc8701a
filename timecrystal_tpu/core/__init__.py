"""Core tensor-network layer: padded MPS, gates, truncation, observables.

TPU-native replacement of reference src/core/ (tensor_utils.py,
observables.py) with the same public surface (src/core/__init__.py:8-12).
"""

from .gates import pauli_matrices
from .mps import MPS, create_initial_state, product_state
from .observables import (calculate_loschmidt_echo, correlation_function,
                          magnetization)
from .truncate import TruncParams, apply_two_site_gate

__all__ = [
    "MPS", "create_initial_state", "product_state", "pauli_matrices",
    "apply_two_site_gate", "TruncParams", "calculate_loschmidt_echo",
    "magnetization", "correlation_function",
]
