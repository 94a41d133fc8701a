"""Multi-host (DCN) scale-out for ensemble and phase-grid sweeps.

SURVEY.md section 5 (distributed communication backend): within one slice
the realization batch shards over ICI (parallel/sweep.py); once sweeps
outgrow a slice, the same batch axis scales over DCN across hosts.  The
workload is embarrassingly parallel per realization, so the multi-host
design is pure SPMD over the GLOBAL device mesh: every process holds the
(tiny) parameter arrays, the batch axis shards over all devices of all
processes, each device evolves its realizations independently, and the
only cross-host traffic is the trace gather at the end
(``multihost_utils.process_allgather`` -- one small collective per sweep,
never inside the TEBD step).

The reference has no analog (single process, serial loops).

Usage (every participating process runs the SAME program):

    from timecrystal_tpu.parallel import multihost as mh
    mh.initialize()                       # no-op single-process / on TPU
                                          # pods with auto-bootstrap env
    mesh = mh.global_mesh()
    traces = mh.evolve_batch_multihost(h_fields, taus, basis, spec,
                                       mesh=mesh)   # numpy, full batch

Validated end-to-end by tests/test_multihost.py: a 2-process CPU cluster
(Gloo collectives, 4 virtual devices per process) produces traces
bit-identical to the single-process unsharded path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sweep import SweepSpec, evolve_batch


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bootstrap ``jax.distributed`` for a multi-process run.

    Thin wrapper so callers need no jax.distributed imports: on TPU pods
    and managed clusters all arguments auto-detect from the environment
    (pass nothing); on hand-rolled CPU/GPU clusters pass the coordinator
    ``host:port``, world size, and this process's rank.  A no-op when the
    distributed service is already initialized (safe to call from shared
    entry points).  Single-process runs never need this.
    """
    try:       # private-API probe; jax.distributed exposes no public "is
        # initialized" predicate as of jax 0.9
        already = jax._src.distributed.global_state.client is not None
    except AttributeError:
        already = False
    if already:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    except RuntimeError as e:   # raced/duplicate init: keep the first one
        # jax 0.9 wording: "distributed.initialize should only be called
        # once."; older/other versions say "already initialized"
        msg = str(e).lower()
        if "already initialized" not in msg and "only be called once" not in msg:
            raise


def global_mesh(axis_name: str = "batch") -> Mesh:
    """1D mesh over ALL global devices (every process of the job).

    In a multi-process run ``jax.devices()`` already enumerates the global
    device set, so this is the DCN-spanning analog of
    ``parallel.sweep.default_mesh`` (which it equals single-process).  The
    batch axis needs no ICI/DCN topology awareness: realizations never
    communicate, so device order does not affect traffic.
    """
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def shard_batch(arr, mesh: Mesh, axis_name: str = "batch"):
    """Host-replicated numpy/jax array -> globally batch-sharded jax.Array.

    Every process passes the SAME full array (parameters are tiny: [R, L]
    disorder fields); each process materializes only its addressable
    shards.  The leading axis must be a multiple of the mesh size.  Works
    unchanged (and cheaply) single-process.
    """
    arr = np.asarray(arr)
    sh = NamedSharding(mesh, P(axis_name, *([None] * (arr.ndim - 1))))
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def replicate(arr, mesh: Mesh):
    """Host value -> fully-replicated global jax.Array (every device holds
    a copy); for per-run constants like ``basis_indices``."""
    arr = np.asarray(arr)
    sh = NamedSharding(mesh, P())
    return jax.make_array_from_callback(arr.shape, sh, lambda idx: arr[idx])


def gather(tree):
    """Globally-sharded result pytree -> numpy pytree of the FULL arrays,
    identical on every process (one allgather across hosts; device_get
    semantics single-process)."""
    return multihost_utils.process_allgather(tree, tiled=True)


def evolve_batch_multihost(h_fields, taus, basis_indices, spec: SweepSpec,
                           mesh: Mesh | None = None,
                           axis_name: str = "batch",
                           correlation_site: int | None = None,
                           two_time_anchor: int | None = None,
                           thetas=None):
    """Fixed-chi batched Floquet evolution sharded over the GLOBAL mesh.

    The multi-host analog of ``parallel.sweep.evolve_batch_sharded``: same
    SPMD program (each device evolves its realization shard independently),
    but inputs are constructed as global arrays so the batch spans every
    process's devices, and traces are allgathered so every process returns
    the FULL [R, ...] numpy arrays.  Every process must call this with
    identical arguments (the usual SPMD contract).

    The batch is padded to a mesh-size multiple with copies of realization
    0; padded entries are sliced off the returned traces.

    ``thetas``: optional [R] per-realization kick angle (the drive-strength
    axis, evolve_batch docstring) -- one more batch-sharded input, so
    drive-strength grids scale over DCN like any other sweep.
    """
    mesh = mesh or global_mesh(axis_name)
    h_fields = np.asarray(jax.device_get(h_fields))
    taus = np.asarray(jax.device_get(taus))
    R = int(h_fields.shape[0])
    n_dev = mesh.devices.size
    pad_r = (-R) % n_dev
    if pad_r:
        h_fields = np.concatenate([h_fields,
                                   np.tile(h_fields[:1], (pad_r, 1))])
        taus = np.concatenate([taus, np.tile(taus[:1], (pad_r,))])
    h_g = shard_batch(h_fields, mesh, axis_name)
    taus_g = shard_batch(taus, mesh, axis_name)
    basis_g = replicate(np.asarray(basis_indices), mesh)
    thetas_g = None
    if thetas is not None:
        thetas = np.asarray(jax.device_get(thetas))
        if pad_r:
            thetas = np.concatenate([thetas, np.tile(thetas[:1], (pad_r,))])
        thetas_g = shard_batch(thetas, mesh, axis_name)
    out = evolve_batch(h_g, taus_g, basis_g, spec,
                       correlation_site=correlation_site,
                       two_time_anchor=two_time_anchor, thetas=thetas_g)
    out = gather(out)
    return {k: v[:R] for k, v in out.items()}


def disorder_ensemble_multihost(key, n_realizations: int, spec: SweepSpec,
                                h_disorder: float, tau: float,
                                state_type: str = "neel",
                                mesh: Mesh | None = None):
    """Multi-host ``parallel.sweep.disorder_ensemble`` (fixed-chi path).

    The jax.random draw is deterministic in ``key`` so every process
    constructs identical fields without communication.
    """
    from ..models.kicked_ising import draw_disorder_batch
    from .sweep import _basis_indices

    h = draw_disorder_batch(key, n_realizations, spec.L, h_disorder)
    taus = np.full((n_realizations,), tau, dtype=np.float64)
    basis = _basis_indices(spec.L, state_type)
    return evolve_batch_multihost(h, taus, basis, spec, mesh=mesh)
