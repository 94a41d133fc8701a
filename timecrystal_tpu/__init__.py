"""timecrystal_tpu: TPU-native discrete-time-crystal tensor-network framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
connor-a-casey/time-crystal-tensor-network (reference mounted read-only at
/root/reference), designed TPU-first: fixed-shape padded-bond MPS, batched
even/odd TEBD updates on the MXU, lax.scan period loops, vmap disorder
ensembles and shard_map phase-diagram sweeps over device meshes.
"""

__version__ = "0.2.0"

# Convenience top-level API (deep imports remain the canonical paths)
from .core.mps import MPS, create_initial_state  # noqa: E402,F401
from .core.truncate import TruncParams  # noqa: E402,F401
from .dynamics.tebd import CustomFloquet, TEBDEvolution  # noqa: E402,F401
from .dynamics.tdvp import TDVPEvolution, TDVPFloquetEvolution  # noqa: E402,F401
from .dynamics.open_system import LindbladEvolution, OpenSystemEvolution  # noqa: E402,F401
from .models.kicked_ising import KickedIsingModel  # noqa: E402,F401

__all__ = [
    "MPS", "create_initial_state", "TruncParams", "CustomFloquet",
    "TEBDEvolution", "TDVPEvolution", "TDVPFloquetEvolution",
    "LindbladEvolution", "OpenSystemEvolution", "KickedIsingModel",
]
