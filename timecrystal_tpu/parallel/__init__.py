"""Multi-device parallelism: batched/sharded sweeps and site-axis sharding.

Two orthogonal axes (SURVEY.md sections 2.3 and 5):
  * sweep.py        -- data-parallel analog: disorder realizations / phase
                       grids vmapped and sharded over a mesh;
  * site_shard.py   -- sequence-parallel analog: the MPS site axis sharded
                       over a mesh with boundary-bond neighbor exchange,
                       for chains too long for one chip.

Plus the cross-host extension of the first axis:
  * multihost.py    -- the batch axis over DCN across processes/hosts
                       (jax.distributed bootstrap, global meshes,
                       allgathered traces).
"""

from .multihost import (disorder_ensemble_multihost, evolve_batch_multihost,
                        global_mesh)
from .site_shard import evolve_floquet_sharded, site_mesh
from .sweep import (SweepSpec, default_mesh, disorder_ensemble, evolve_batch,
                    evolve_batch_auto, evolve_batch_sharded, phase_grid_batch)

__all__ = [
    "SweepSpec", "default_mesh", "disorder_ensemble", "evolve_batch",
    "evolve_batch_auto", "evolve_batch_sharded", "phase_grid_batch",
    "evolve_floquet_sharded", "site_mesh",
    "evolve_batch_multihost", "disorder_ensemble_multihost", "global_mesh",
]
