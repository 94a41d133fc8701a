"""timecrystal_tpu: TPU-native discrete-time-crystal tensor-network framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
connor-a-casey/time-crystal-tensor-network (reference mounted read-only at
/root/reference), designed TPU-first: fixed-shape padded-bond MPS, batched
even/odd TEBD updates on the MXU, lax.scan period loops, vmap disorder
ensembles and shard_map phase-diagram sweeps over device meshes.
"""

__version__ = "0.1.0"
