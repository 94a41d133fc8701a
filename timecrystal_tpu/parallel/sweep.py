"""Multi-device parallelism: disorder ensembles and phase-diagram sweeps.

The reference has NO parallelism of any kind (SURVEY.md section 2.3: the
phase sweep is a serial double for-loop, main.py:467-481; one disorder seed
per run).  The TPU-native design makes the two embarrassingly-parallel axes
first-class:

  * disorder realizations -- ``vmap`` over the h_i field batch,
  * phase-diagram grid (h/J x T.J) -- flattened into the same batch axis,

and shards the batch over a ``jax.sharding.Mesh``.  The only cross-device
traffic is the scatter of (h_fields, tau) parameters in and the gather of
observable time-series out -- no collectives inside the TEBD step itself
(the physics is independent per realization), so the sharded program is
pure SPMD with ICI traffic only at the boundaries.

Traces come back as [batch, n_periods+1, ...] arrays; DTC detection runs
host-side on these tiny series (analysis/detection.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import gates as G
from ..core.mps import (entanglement_entropy, expectation_one_site,
                        max_bond_dimension, overlap, product_state)
from ..core.truncate import PROJECTED_SVD_METHODS, TruncParams
from ..models.kicked_ising import make_floquet_gates
from ..ops import cpx


class SweepSpec(NamedTuple):
    """Static configuration of a batched Floquet evolution."""

    L: int
    chi: int
    n_periods: int
    J: float = 1.0
    theta: float = float(np.pi)
    tp: TruncParams = TruncParams.reference_hot_path()
    dtype: str = "float32"   # 'float32' | 'float64'
    frame: str = "strict"    # 'strict' | 'merged' (see tebd.evolve_floquet_scan)


def _traces_one(h_fields, tau, basis_indices, spec: SweepSpec,
                correlation_site: int | None = None,
                two_time_anchor: int | None = None, theta=None):
    """Evolve one realization; pure jnp (h_fields, tau, theta may be traced).

    ``correlation_site=i`` adds a zz_corr [n+1, L] trace (the full
    <sz_i sz_j> profile per period, observables.zz_correlation_profile)
    -- vmapped over the batch this yields disorder-averaged C(r, t) maps
    entirely on device.  Exact in both frames (z-diagonal).

    ``two_time_anchor=i`` adds zz2t_re / zz2t_im [n+1, L] traces: the
    TWO-TIME correlator <sz_i(0) sz_j(t)> (the standard period-doubling
    diagnostic, dynamics.tebd.evolve_two_time_zz), evolving the auxiliary
    state sz_i|psi0> alongside (2x the evolution cost).  Also exact in
    both frames (the half-step frame change is z-diagonal)."""
    from ..core.observables import cross_sz_profile, zz_correlation_profile
    from ..models.kicked_ising import (floquet_period, floquet_period_merged,
                                       ising_half_step)

    dtype = jnp.float32 if spec.dtype == "float32" else jnp.float64
    psi0 = product_state(basis_indices, chi=spec.chi, dtype=dtype)
    gates = make_floquet_gates(spec.J, h_fields.astype(dtype), tau,
                               theta=spec.theta if theta is None else theta,
                               dtype=dtype)
    sz_op = G.pauli_c("z", dtype)
    L = spec.L
    signs = jnp.asarray(np.where(np.arange(L) % 2 == 0, 1.0, -1.0), dtype)

    two_time = two_time_anchor is not None
    merged = spec.frame == "merged"
    phi_start = None
    if two_time:
        from ..core.mps import apply_sz

        phi_start = apply_sz(psi0, two_time_anchor)
    if merged:
        # half-step frame: sz and LE traces are exact, entropy/chi traces
        # belong to the half-step-shifted state (kicked_ising.
        # floquet_period_merged docstring).
        psi_start, _ = ising_half_step(psi0, gates, spec.tp)
        ref_state = psi_start
        if two_time:
            phi_start, _ = ising_half_step(phi_start, gates, spec.tp)
    else:
        psi_start = psi0
        ref_state = psi0

    def period_fn(carry, _):
        psi, phi = carry
        if merged:
            psi, err = floquet_period_merged(psi, gates, spec.tp)
        else:
            psi, err = floquet_period(psi, gates, spec.tp)
        sz = expectation_one_site(psi, sz_op).re
        le = cpx.abs2(overlap(ref_state, psi))
        chi_eff = max_bond_dimension(psi)
        ent_mid = entanglement_entropy(psi)[L // 2]
        out = dict(sz_sites=sz, loschmidt_echo=le, max_chi=chi_eff,
                   entropy_mid=ent_mid, trunc_err=err)
        if correlation_site is not None:
            out["zz_corr"] = zz_correlation_profile(psi, correlation_site)
        if two_time:
            if merged:
                phi, _ = floquet_period_merged(phi, gates, spec.tp)
            else:
                phi, _ = floquet_period(phi, gates, spec.tp)
            c = cross_sz_profile(phi, psi)
            out["zz2t_re"], out["zz2t_im"] = c.re, c.im
        return (psi, phi), out

    (psi_final, _), tr = jax.lax.scan(period_fn, (psi_start, phi_start),
                                      None, length=spec.n_periods)
    # prepend t=0 observables
    sz0 = expectation_one_site(psi0, sz_op).re
    tr["sz_sites"] = jnp.concatenate([sz0[None], tr["sz_sites"]], axis=0)
    one = jnp.ones((1,), dtype)
    tr["loschmidt_echo"] = jnp.concatenate([one, tr["loschmidt_echo"]])
    tr["max_chi"] = jnp.concatenate([jnp.ones((1,), tr["max_chi"].dtype), tr["max_chi"]])
    tr["entropy_mid"] = jnp.concatenate([jnp.zeros((1,), dtype), tr["entropy_mid"]])
    tr["trunc_err"] = jnp.concatenate([jnp.zeros((1,), dtype), tr["trunc_err"]])
    if correlation_site is not None:
        zz0 = zz_correlation_profile(psi0, correlation_site)
        tr["zz_corr"] = jnp.concatenate([zz0[None], tr["zz_corr"]], axis=0)
    if two_time:
        # t=0: the two-time and equal-time profiles coincide (real)
        c0 = zz_correlation_profile(psi0, two_time_anchor)
        tr["zz2t_re"] = jnp.concatenate([c0[None], tr["zz2t_re"]], axis=0)
        tr["zz2t_im"] = jnp.concatenate([jnp.zeros((1, L), dtype),
                                         tr["zz2t_im"]], axis=0)
    tr["magnetization"] = tr["sz_sites"].sum(axis=-1)
    tr["staggered_magnetization"] = (tr["sz_sites"] * signs[None]).sum(axis=-1) / L
    return tr


@partial(jax.jit, static_argnames=("spec", "correlation_site",
                                   "two_time_anchor"))
def evolve_batch(h_fields: jax.Array, taus: jax.Array, basis_indices: jax.Array,
                 spec: SweepSpec, correlation_site: int | None = None,
                 two_time_anchor: int | None = None,
                 thetas: jax.Array | None = None):
    """vmapped Floquet evolution over a batch of realizations.

    Args:
      h_fields:      [R, L] disorder fields per realization.
      taus:          [R] half-period per realization (phase grids vary tau).
      basis_indices: [L] shared initial product state (0 = up).
      spec:          static SweepSpec.
      correlation_site: when set, traces gain zz_corr [R, n+1, L] -- the
        <sz_i sz_j> profile per realization per period (disorder-averaged
        C(r, t) maps are one mean over axis 0).
      two_time_anchor: when set, traces gain zz2t_re / zz2t_im
        [R, n+1, L] -- the two-time correlator <sz_i(0) sz_j(t)> per
        realization (_traces_one docstring; 2x the evolution cost).
      thetas: optional [R] kick angle per realization -- the DRIVE-STRENGTH
        axis (pulse imperfection eps = 1 - theta/pi).  The reference
        abstract advertises "sweeping the drive strength" but its code
        never implements it; here it is one more vmapped batch axis
        (gates are analytic in theta, models/kicked_ising.py:72-97).
        Overrides spec.theta.

    Returns a dict of stacked traces with leading batch axis [R, ...].
    """
    spec = _resolve_svd_method(spec, h_fields.shape[0],
                               entangling=thetas is not None)
    if thetas is None:
        return jax.vmap(lambda h, t: _traces_one(h, t, basis_indices, spec,
                                                 correlation_site,
                                                 two_time_anchor))(h_fields,
                                                                   taus)
    return jax.vmap(lambda h, t, th: _traces_one(
        h, t, basis_indices, spec, correlation_site, two_time_anchor,
        theta=th))(h_fields, taus, thetas)


def _resolve_svd_method(spec: SweepSpec, R: int,
                        entangling: bool | None = None) -> SweepSpec:
    """Resolve svd_method='auto' with the VMAP batch size in view.

    csvd_topk's own 'auto' rule sees only the per-realization shape when
    traced under vmap (the leading R axis is invisible to it), so large
    sweeps of small-chi points would route to the Jacobi kernel whose VPU
    time grows linearly with the batch.  Resolve here instead: the
    amortized batched gram_eigh ONLY for the reference phase-grid class
    (exact-pi kicks, whose dynamics stays rank-1); jacobi everywhere
    else.

    The routing is a WORKER-FAULT guard, not (only) a speed call
    (measured 2026-08-20, baselines/gram_eigh_fault_probe.py): batched
    gram_eigh on ENTANGLING panels kernel-faults the axon worker from
    ~300 matrices per program (20 rows x 15 bonds at n=96; 1800
    rank-DENSE matrices at n=64 also fault) -- while the SAME 1800-matrix
    n=64 program on the exact-pi phase grid's rank-1 data ran twice the
    same day, so the worker's eigh fault is data-dependent.  The same
    drive-grid program also ran in a round-3 session: the boundary is
    worker-version-dependent; re-map it with the probe after worker
    updates.  The Jacobi kernel runs at its documented rows*chi^2 ~ 92k
    envelope (utils.backend.auto_chunk_rows) regardless of data.

    ``entangling``: True when the sweep's dynamics genuinely fills rank
    (a per-realization thetas axis, or spec.theta != pi).  Default None
    derives it from spec.theta alone.  The exact-pi test is a small-
    tolerance comparison (rel 1e-6), not exact equality: a float32-rounded
    pi (float(np.float32(np.pi)) differs from math.pi at 1e-8) is still
    the rank-1 class, and misclassifying it as entangling would silently
    drop the amortized gram_eigh fast path for a genuinely exact-pi
    sweep.  1e-6 sits far below any physical pulse imperfection (the
    drive-strength axis starts at eps ~ 1e-2) and far above f32 rounding."""
    import math

    if spec.tp.svd_method != "auto" or jax.default_backend() == "cpu":
        return spec
    off_pi = not math.isclose(float(spec.theta), math.pi, rel_tol=1e-6)
    entangling = off_pi if entangling is None else (entangling or off_pi)
    n = 2 * spec.chi
    total = R * max(spec.L - 1, 1)
    method = "jacobi" if (entangling or n >= 96
                          or (total <= 64 and n >= 32)) else "gram_eigh"
    return spec._replace(tp=spec.tp._replace(svd_method=method))


@partial(jax.jit, static_argnames=("n", "tp", "frame", "correlation_site"))
def _chunk_batch(psi_b, gates_b, psi0_b, n: int, tp: TruncParams, frame: str,
                 correlation_site: int | None = None):
    from ..dynamics.tebd import evolve_floquet_scan

    def one(p, g, r):
        return evolve_floquet_scan(p, g, n, tp, ref_state=r, frame=frame,
                                   correlation_site=correlation_site)

    return jax.vmap(one)(psi_b, gates_b, psi0_b)


def _mesh_place(mesh: Mesh, axis_name: str):
    """Batch-axis placement function for a (possibly multi-process) mesh.

    Single-process: plain device_put.  Multi-process (a DCN-spanning mesh
    from parallel/multihost.py): device_put cannot target non-addressable
    devices, so reshard through a jit identity with ``out_shardings`` --
    the compiler materializes each process's addressable shards.  Inputs
    must be identical on every process (the SPMD contract; they are: host
    parameter arrays or global arrays produced by the same program)."""
    sh = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.jit(lambda x: x, out_shardings=sh)
    return partial(jax.device_put, device=sh)


def _pad_to_mesh(h_fields, taus, mesh: Mesh, axis_name: str):
    """Pad the realization batch to a mesh-size multiple (copies of
    realization 0; callers slice them off the output) and place both
    arrays with the batch-axis NamedSharding.  Returns
    (h_fields, taus, place) with place = the placement function for any
    further batch-shaped arrays."""
    n_dev = mesh.devices.size
    R = int(h_fields.shape[0])
    pad_r = (-R) % n_dev
    if pad_r:
        h_fields = jnp.concatenate(
            [h_fields, jnp.tile(h_fields[:1], (pad_r, 1))])
        taus = jnp.concatenate([taus, jnp.tile(taus[:1], (pad_r,))])
    place = _mesh_place(mesh, axis_name)
    return place(h_fields), place(taus), place


def _stage_tp(tp: TruncParams, chi: int) -> TruncParams:
    """Per-stage svd_method resolution for the STAGED driver: always the
    Pallas Jacobi kernel on TPU (any batch size).

    The escalation criteria (tebd._stage_decision) read truncation error
    and significant-rank occupancy off the SVD output; gram_eigh's junk
    singular values (~sqrt(eps)*sigma_max = 3e-4 relative, vs the Jacobi
    kernel's ~1e-6) sit above both thresholds and poison the schedule.
    Measured on the L=40 chi=256 R=4 window (axon TPU): gram_eigh's noise
    forces a spurious 32->64->128 escalation inside the first 5 periods
    -> 13.2 chain-p/s; the jacobi-clean schedule holds chi=32 for 15
    periods -> 61.7 chain-p/s.  Large fixed-chi sweeps where the
    amortized batched eigh wins (phase grids) use evolve_batch, which
    keeps the batch-aware rule (_resolve_svd_method)."""
    if tp.svd_method != "auto" or jax.default_backend() == "cpu":
        return tp
    method = "jacobi" if 2 * chi >= 32 else "gram_eigh"
    return tp._replace(svd_method=method)


def evolve_batch_auto(h_fields, taus, basis_indices, spec: SweepSpec,
                      chi_start: int = 32, chunk_periods: int = 5,
                      checkpoint_dir: str | None = None,
                      mesh: Mesh | None = None, axis_name: str = "batch",
                      growth: float = 2.0,
                      cap_svd_method: str | None = None,
                      correlation_site: int | None = None):
    """Chi-staged batched Floquet evolution: the ensemble production path.

    The batched analog of dynamics/tebd.evolve_floquet_auto (which the
    reference gets for free from TeNPy's per-bond dynamic rank,
    /root/reference/src/dynamics/tebd_evolution.py): all realizations share
    ONE chi schedule so shapes stay static under vmap.  Evolution starts
    padded at ``chi_start`` and proceeds in chunks; when ANY realization
    saturates its padding the chunk re-runs from the (still exact)
    pre-chunk state at doubled chi, and at 15/16 significant occupancy the
    schedule escalates ahead without a re-run (tebd._stage_decision).
    Because entanglement growth rates are disorder-realization-similar,
    the shared schedule wastes little: the whole ensemble rides the cheap
    low-chi stages through the transient together.

    ``checkpoint_dir``: when set, the batched state persists after each
    completed chunk (utils/checkpoint.save_state handles the leading
    realization axis transparently) and an interrupted run resumes from
    the last checkpoint instead of t=0.

    ``cap_svd_method``: optional svd_method override for chunks running AT
    the ladder cap (chi == spec.chi), where truncation error no longer
    drives escalation -- see dynamics/tebd.evolve_floquet_auto for the
    accuracy/trunc_err-noise tradeoff ('jacobi_core' is the adopted
    saturated-steady-state path: ~5x the full kernel's throughput AND a
    better kept-weight class than 'jacobi_proj', PERFORMANCE.md round-3).

    ``mesh``: when set, the realization axis shards over the device mesh
    (same SPMD structure as evolve_batch_sharded: each device evolves its
    shard independently; the only cross-device traffic is parameter
    scatter and trace gather, plus the per-chunk escalation decision on
    the host).  The batch is padded to a mesh multiple with copies of the
    first realization; padded rows are dropped from the returned traces
    (they still participate in the shared chi schedule, as duplicates of
    realization 0 they add no new escalation pressure).  A multi-process
    (DCN-spanning, parallel/multihost.py) mesh works too: every process
    runs this same call, per-chunk decision data is allgathered so the
    shared chi schedule stays identical across hosts, and every process
    returns the full traces.  Checkpointing there is PER-RANK: each
    process persists its addressable shard of the state (plus the shared
    schedule and the allgathered traces, identical everywhere) under
    ``checkpoint_dir/rank_NNNN`` -- no gather traffic -- and a resume with
    the same cluster topology re-places every rank's rows on the mesh (a
    resized cluster refuses via the fingerprint).

    ``correlation_site``: when set, traces gain ``zz_corr [R, n+1, L]``
    (the in-scan <sz_site sz_j> profile per period, same contract as
    evolve_batch) -- the key joins the chunk trace contract and the
    checkpoint layout, so staged runs, resumes, and mesh-sharded runs all
    carry it.  Exact in both frames (z-diagonal observable).

    Returns (traces, info): traces as evolve_batch (leading axis R,
    time axis n_periods+1 with the t=0 row prepended), info with
    chi_pad_used / chi_escalations / n_rerun_periods / wall_time.
    """
    import os as _os
    import time as _time

    from ..core.mps import pad_mps
    from ..dynamics.tebd import (_next_chi, _stage_decision,
                                 _stage_err_tol)

    dtype = jnp.float32 if spec.dtype == "float32" else jnp.float64
    err_tol = _stage_err_tol(dtype, spec.tp.svd_min, spec.L - 1)
    h_fields = jnp.asarray(h_fields)
    taus = jnp.asarray(taus, dtype)
    # host copies for the resume fingerprint, taken BEFORE mesh placement
    # (a multi-process placement makes the arrays non-fetchable)
    h_fp = np.asarray(jax.device_get(h_fields))
    taus_fp = np.asarray(jax.device_get(taus))
    R_out = int(h_fields.shape[0])
    multiproc = mesh is not None and jax.process_count() > 1
    if multiproc:
        from jax.experimental import multihost_utils

        # escalation decisions need the FULL trace/lambda data on every
        # process (and identical decisions everywhere): allgather instead
        # of device_get, one small collective per chunk
        def fetch(tree):
            return multihost_utils.process_allgather(tree, tiled=True)

        # Per-rank SHARD checkpointing (round-4 VERDICT missing #2): the
        # batched state is sharded across hosts, so each process persists
        # only its addressable rows (global_array_to_host_local_array --
        # no DCN traffic) under its own rank subdirectory, plus the shared
        # schedule state (identical on every rank by the SPMD contract).
        # Resume re-places each rank's rows with
        # host_local_array_to_global_array on the same mesh; the topology
        # (process count/index, mesh size) joins the fingerprint so a
        # resized cluster refuses to resume instead of misassembling rows.
        def _to_local(tree):
            return multihost_utils.global_array_to_host_local_array(
                tree, mesh, P(axis_name))

        def _from_local(tree):
            return jax.tree.map(
                lambda x: multihost_utils.host_local_array_to_global_array(
                    np.asarray(x), mesh, P(axis_name)), tree)
    else:
        fetch = jax.device_get
    if mesh is not None:
        h_fields, taus, place = _pad_to_mesh(h_fields, taus, mesh, axis_name)
    else:
        def place(x):
            return x
    R = int(h_fields.shape[0])
    L = spec.L
    # the chunk trace contract (concat axis 1 = time); zz_corr joins it
    # when the correlation trace is requested so chunking, checkpointing,
    # and resume all carry the key uniformly
    trace_keys = ("sz_sites", "loschmidt_echo", "entropies", "max_chi",
                  "trunc_err") + (("zz_corr",)
                                  if correlation_site is not None else ())
    cap = min(spec.chi, spec.tp.chi_max) if spec.tp.chi_max else spec.chi
    chi = min(chi_start, cap)
    if jax.default_backend() != "cpu":
        # stages below chi=16 (n < 32) would route to gram_eigh, whose
        # junk sigmas poison the escalation criteria (_stage_tp docstring:
        # the measured 32->64->128 runaway); chi=16 is cheap enough that
        # starting lower never wins on the chip
        chi = min(max(chi, 16), cap)
    n_periods = spec.n_periods

    start = _time.time()
    gates = jax.tree.map(place, jax.vmap(lambda h, t: make_floquet_gates(
        spec.J, h.astype(dtype), t, theta=spec.theta, dtype=dtype))(h_fields, taus))

    def fresh(c):
        p0 = product_state(jnp.asarray(basis_indices), chi=c, dtype=dtype)
        return jax.tree.map(
            lambda x: place(jnp.broadcast_to(x, (R,) + x.shape)), p0)

    def pad_batch(p, c):
        return jax.tree.map(place, jax.vmap(pad_mps, in_axes=(0, None))(p, c))

    psi = fresh(chi)
    psi0 = psi
    p_done, n_rerun = 0, 0
    escalations: list = []
    chunks: list = []

    wall_prev = 0.0
    if checkpoint_dir is not None:
        import hashlib

        from ..utils.checkpoint import (atomic_savez, load_state, save_state,
                                        state_exists)
        if multiproc:
            # each rank owns its subdirectory: no cross-rank file races,
            # and the layout works whether or not ranks share a filesystem
            checkpoint_dir = _os.path.join(
                checkpoint_dir, f"rank_{jax.process_index():04d}")
        ck_state = _os.path.join(checkpoint_dir, "batch_auto_state")
        # per-chunk trace files: each checkpoint writes ONE new chunk npz
        # instead of rewriting every accumulated chunk (the old single-npz
        # layout cost O(n_chunks^2) total compression over a run; see
        # ROADMAP "known limitations", now closed)
        ck_chunk_dir = _os.path.join(checkpoint_dir, "batch_auto_chunks")
        ck_traces_legacy = _os.path.join(checkpoint_dir,
                                         "batch_auto_traces.npz")

        def _chunk_path(i):
            return _os.path.join(ck_chunk_dir, f"chunk_{i:05d}.npz")
        # Fingerprint of everything that must MATCH between the original
        # run and a resume (only n_periods may legitimately change): a
        # shape-compatible checkpoint of a different Hamiltonian would
        # otherwise silently continue the wrong evolution.
        fp_src = repr((spec._replace(n_periods=0),
                       np.round(h_fp, 12).tolist(),
                       np.round(taus_fp, 12).tolist(),
                       np.asarray(basis_indices).tolist(),
                       chi_start, growth, chunk_periods)
                      # appended only when set: keeps default-run
                      # fingerprints (and old checkpoints) stable
                      + ((cap_svd_method,) if cap_svd_method else ())
                      + ((("corr", correlation_site),)
                         if correlation_site is not None else ())
                      + ((("procs", jax.process_count(),
                           jax.process_index(), int(mesh.devices.size)),)
                         if multiproc else ())).encode()
        fingerprint = hashlib.sha256(fp_src).hexdigest()
        if state_exists(ck_state) and (
                _os.path.exists(_chunk_path(0))
                or _os.path.exists(ck_traces_legacy)):
            psi, meta = load_state(ck_state, dtype=dtype)
            ck_fp = meta.get("fingerprint")
            if ck_fp is not None and ck_fp != fingerprint:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} was written by a run "
                    "with different parameters (fields/taus/spec/ladder); "
                    "refusing to resume -- delete it or point elsewhere")
            if multiproc:
                # this rank's rows -> global sharded array on the mesh
                psi = _from_local(psi)
            else:
                psi = jax.tree.map(place, psi)   # restore mesh sharding
            p_done = int(meta["p_done"])
            chi = int(meta["chi"])
            escalations = list(meta.get("escalations", []))
            n_rerun = int(meta.get("n_rerun", 0))
            wall_prev = float(meta.get("wall_time", 0.0))
            psi0 = fresh(chi)
            n_need = int(meta["n_chunks"])
            if all(_os.path.exists(_chunk_path(i)) for i in range(n_need)):
                # chunk files are written BEFORE the state, so every index
                # meta promises is present (a kill between the two leaves
                # one EXTRA file, recomputed and overwritten on resume)
                chunks = []
                for i in range(n_need):
                    with np.load(_chunk_path(i)) as z:
                        chunks.append({k: z[k] for k in trace_keys})
            else:           # legacy single-npz layout (pre round-3 runs)
                with np.load(ck_traces_legacy) as z:
                    n_ck = len([k for k in z.files
                                if k.startswith("sz_sites__")])
                    chunks = [{k: z[f"{k}__{i}"] for k in trace_keys}
                              for i in range(min(n_ck, n_need))]
                # migrate: backfill per-chunk files so this and every
                # future checkpoint stays O(1) and later resumes see a
                # complete chunk-file set (atomic per file; an interrupted
                # backfill re-enters the legacy branch above)
                for i, c in enumerate(chunks):
                    if not _os.path.exists(_chunk_path(i)):
                        atomic_savez(_chunk_path(i), **c)

    while p_done < n_periods:
        n = min(chunk_periods, n_periods - p_done)
        # at the ladder cap escalation is over (chi < cap gates both
        # triggers), so the noisy-trunc_err fast path is safe to route
        if cap_svd_method and chi >= cap:
            tp = spec.tp._replace(svd_method=cap_svd_method)
        else:
            tp = _stage_tp(spec.tp, chi)
            if chi < cap and tp.svd_method in PROJECTED_SVD_METHODS:
                # same guard as dynamics/tebd.evolve_floquet_auto: below
                # the cap escalation reads trunc_err, which projected
                # methods report at the f32 noise floor -- override to the
                # bit-faithful kernel; only cap_svd_method routes projected
                tp = tp._replace(svd_method="jacobi")
        psi_next, tr = _chunk_batch(psi, gates, psi0, n, tp, spec.frame,
                                    correlation_site)
        tr, exit_lam = fetch((tr, psi_next.lam))
        # trunc-err / significant-rank escalation criteria (the batch
        # shares one schedule: ANY realization's truncation escalates all)
        # merged-frame chunk-boundary (entry/exit half-step) error included:
        # the per-period trace never sees it
        errs = np.append(np.ravel(tr["trunc_err"]),
                         np.ravel(tr.get("trunc_err_boundary", 0.0)))
        saturated, ahead = _stage_decision(errs, exit_lam, chi, err_tol)
        if saturated and chi < cap:
            new_chi = _next_chi(chi, cap, growth)
            escalations.append({"period": p_done, "from": chi, "to": new_chi})
            n_rerun += n
            chi = new_chi
            psi = pad_batch(psi, chi)
            psi0 = pad_batch(psi0, chi)
            continue
        if ahead and chi < cap and p_done + n < n_periods:
            new_chi = _next_chi(chi, cap, growth)
            escalations.append({"period": p_done + n, "from": chi,
                                "to": new_chi, "ahead": True})
            chi = new_chi
            psi_next = pad_batch(psi_next, chi)
            psi0 = pad_batch(psi0, chi)
        psi = psi_next
        chunks.append(tr)
        p_done += n
        if checkpoint_dir is not None:
            # the NEW chunk first (atomic), then the state: any kill point
            # leaves a loadable pair (an orphan chunk file beyond the
            # state's n_chunks is ignored and overwritten on resume)
            i_new = len(chunks) - 1
            atomic_savez(_chunk_path(i_new),
                         **{k: chunks[i_new][k] for k in trace_keys})
            # multi-process: persist only this rank's addressable rows
            # (the traces above are allgathered -- identical on every
            # rank -- so each rank's directory is self-contained).  npz
            # format there: orbax's save/restore run cross-process
            # barriers whose names include the (rank-specific) directory,
            # which deadlocks the cluster; npz has no collectives.
            save_state(ck_state, _to_local(psi) if multiproc else psi,
                       {"p_done": p_done, "chi": chi,
                        "escalations": escalations,
                        "n_chunks": len(chunks),
                        "n_rerun": n_rerun,
                        "wall_time": wall_prev + (_time.time() - start),
                        "fingerprint": fingerprint},
                       format="npz" if multiproc else "auto")

    wall_time = wall_prev + (_time.time() - start)
    cat = {k: np.concatenate([c[k] for c in chunks], axis=1)[:, :n_periods]
           for k in trace_keys}
    # the slice keeps the [R, n_periods(+1)] contract when a resume's
    # checkpoint already holds MORE periods than this call requested
    basis = np.asarray(basis_indices)
    sz0 = np.broadcast_to((1.0 - 2.0 * basis).astype(cat["sz_sites"].dtype),
                          (R, L))
    traces = {
        "sz_sites": np.concatenate([sz0[:, None, :], cat["sz_sites"]], axis=1),
        "loschmidt_echo": np.concatenate(
            [np.ones((R, 1), cat["loschmidt_echo"].dtype),
             cat["loschmidt_echo"]], axis=1),
        "max_chi": np.concatenate(
            [np.ones((R, 1), cat["max_chi"].dtype), cat["max_chi"]], axis=1),
        "entropy_mid": np.concatenate(
            [np.zeros((R, 1), cat["entropies"].dtype),
             cat["entropies"][:, :, L // 2]], axis=1),
        "trunc_err": np.concatenate(
            [np.zeros((R, 1), cat["trunc_err"].dtype), cat["trunc_err"]],
            axis=1),
    }
    if correlation_site is not None:
        # t=0 profile of the shared product state: <sz_i sz_j> = s_i s_j
        # for j != i (and exactly 1 at j == i), s = 1 - 2*basis -- the
        # closed form of observables.zz_correlation_profile on a product
        # state, so no device call is needed for the prepended row
        s = (1.0 - 2.0 * basis).astype(cat["zz_corr"].dtype)
        zz0 = s[correlation_site] * s
        zz0[correlation_site] = 1.0
        traces["zz_corr"] = np.concatenate(
            [np.broadcast_to(zz0, (R, 1, L)), cat["zz_corr"]], axis=1)
    from ..core.observables import add_derived_magnetization

    add_derived_magnetization(traces, L)
    if R_out != R:                        # drop mesh-padding duplicates
        traces = {k: v[:R_out] for k, v in traces.items()}
    info = {
        "wall_time": wall_time,
        "chain_periods_per_second": R_out * n_periods / wall_time
        if wall_time > 0 else float("inf"),
        "chi_pad_used": chi,
        "chi_escalations": escalations,
        "n_rerun_periods": n_rerun,
    }
    return traces, info


def default_mesh(axis_name: str = "batch", devices=None) -> Mesh:
    """1D mesh over all local devices (v5e-8 slice or virtual CPU devices)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis_name,))


def evolve_batch_sharded(h_fields, taus, basis_indices, spec: SweepSpec,
                         mesh: Mesh | None = None, axis_name: str = "batch",
                         correlation_site: int | None = None,
                         two_time_anchor: int | None = None,
                         thetas: jax.Array | None = None):
    """Shard the realization batch over the device mesh.

    The batch is padded up to a multiple of the mesh size (padded entries are
    discarded from the returned traces).  XLA partitions the vmapped program
    SPMD over the mesh: each device evolves its shard of realizations
    independently; results gather over ICI at the output.

    On a multi-process (DCN-spanning) mesh this routes to
    ``multihost.evolve_batch_multihost``, which returns host numpy traces
    (device arrays here could not be sliced host-side: the batch is not
    fully addressable from one process).
    """
    mesh = mesh or default_mesh(axis_name)
    if jax.process_count() > 1:
        from .multihost import evolve_batch_multihost

        return evolve_batch_multihost(h_fields, taus, basis_indices, spec,
                                      mesh=mesh, axis_name=axis_name,
                                      correlation_site=correlation_site,
                                      two_time_anchor=two_time_anchor,
                                      thetas=thetas)
    R = int(h_fields.shape[0])
    h_fields, taus, place = _pad_to_mesh(h_fields, taus, mesh, axis_name)
    if thetas is not None:
        thetas = jnp.asarray(thetas)
        pad_r = int(h_fields.shape[0]) - R
        if pad_r:
            thetas = jnp.concatenate([thetas, jnp.tile(thetas[:1], (pad_r,))])
        thetas = place(thetas)
    basis_indices = jax.device_put(jnp.asarray(basis_indices),
                                   NamedSharding(mesh, P()))
    out = evolve_batch(h_fields, taus, basis_indices, spec,
                       correlation_site=correlation_site,
                       two_time_anchor=two_time_anchor, thetas=thetas)
    return {k: v[:R] for k, v in out.items()}


def disorder_ensemble(key, n_realizations: int, spec: SweepSpec,
                      h_disorder: float, tau: float, state_type: str = "neel",
                      mesh: Mesh | None = None, staged: bool = False,
                      chi_start: int = 32, chunk_periods: int = 5,
                      cap_svd_method: str | None = None,
                      correlation_site: int | None = None):
    """Batched disorder ensemble (BASELINE config disordered_time_crystal:
    'random fields h_i, N disorder realizations vmapped').

    ``staged=True`` routes through the chi-staged driver
    (evolve_batch_auto) -- the fast path for entangling transients (pads
    small, escalates only on real truncation; 162x the CPU window on the
    headline workload) -- and then returns ONLY the traces dict, same
    contract as the fixed-chi path.  ``cap_svd_method`` (staged only)
    forwards to evolve_batch_auto: the at-cap fast-SVD override."""
    from ..models.kicked_ising import draw_disorder_batch

    h = draw_disorder_batch(key, n_realizations, spec.L, h_disorder)
    taus = jnp.full((n_realizations,), tau)
    basis = _basis_indices(spec.L, state_type)
    if staged:
        traces, _ = evolve_batch_auto(h, taus, jnp.asarray(basis), spec,
                                      chi_start=chi_start,
                                      chunk_periods=chunk_periods, mesh=mesh,
                                      cap_svd_method=cap_svd_method,
                                      correlation_site=correlation_site)
        return traces
    if mesh is not None:
        return evolve_batch_sharded(h, taus, basis, spec, mesh,
                                    correlation_site=correlation_site)
    return evolve_batch(h, jnp.asarray(taus), jnp.asarray(basis), spec,
                        correlation_site=correlation_site)


def phase_grid_batch(h_over_J_values, T_J_values, spec: SweepSpec,
                     disorder_seed: int = 42):
    """Flatten a (h/J x T.J) grid into (h_fields, taus) batches.

    Replicates the reference's per-point disorder construction exactly:
    np.random.seed(seed) is re-run per point, so every point uses the SAME
    unit disorder pattern scaled by its h (reference main.py:318-324 +
    kicked_ising.py:55-59) -- h_fields(h) = h * base_pattern.
    """
    np.random.seed(disorder_seed)
    base = np.random.uniform(-1.0, 1.0, spec.L)   # same MT19937 stream
    hs, Ts = np.meshgrid(np.asarray(h_over_J_values), np.asarray(T_J_values),
                         indexing="ij")
    hs, Ts = hs.ravel(), Ts.ravel()
    h_fields = hs[:, None] * spec.J * base[None, :]
    taus = Ts / (2.0 * spec.J)                    # tau = T_J/(2 J), main.py:315
    return jnp.asarray(h_fields), jnp.asarray(taus), hs, Ts


def _basis_indices(L: int, state_type: str) -> np.ndarray:
    if state_type == "neel":
        return np.array([0 if i % 2 == 0 else 1 for i in range(L)], np.int32)
    if state_type == "all_up":
        return np.zeros(L, np.int32)
    if state_type == "all_down":
        return np.ones(L, np.int32)
    raise ValueError(f"Unknown state type for sweeps: {state_type}")


def ensemble_a2t(traces, taus, series_key: str = "staggered_magnetization"):
    """Per-realization subharmonic amplitudes A2T, entirely on device.

    For large ensembles (10^3-10^4 realizations) the host round-trip of
    every trace just to read one FFT bin dominates analysis time; this
    evaluates the reference's A2T recipe (observables.
    extract_subharmonic_amplitude) for the WHOLE batch in one device call
    via the matmul DFT (ops/fft.py, parity-tested vs the host recipe).

    Args:
      traces: dict from evolve_batch / evolve_batch_sharded (leading axis =
              realization), containing ``series_key`` [R, n+1].
      taus:   [R] half-periods (drive period = 2 tau).

    Returns [R] A2T values as a device array.
    """
    from ..ops.fft import batched_subharmonic_amplitude

    series = jnp.asarray(traces[series_key])
    R, n1 = series.shape
    taus = jnp.asarray(taus, series.dtype)
    times = jnp.arange(n1, dtype=series.dtype)[None, :] * (2.0 * taus)[:, None]
    a2t = batched_subharmonic_amplitude(times, series, 2.0 * taus)
    a2t_np = np.array(a2t)          # writable host copy
    if np.isnan(a2t_np).any():
        # non-finite traces come back NaN from the device recipe (a fixed-
        # shape program cannot drop samples); recompute those few with the
        # host recipe, which filters invalid samples like the reference
        from ..core.observables import extract_subharmonic_amplitude
        t_np, s_np, tau_np = (np.asarray(times), np.asarray(series),
                              np.asarray(taus))
        for r in np.flatnonzero(np.isnan(a2t_np)):
            a2t_np[r] = extract_subharmonic_amplitude(
                t_np[r], s_np[r], 2.0 * float(tau_np[r]))
        return jnp.asarray(a2t_np)
    return a2t
