"""Floquet and Suzuki-Trotter TEBD evolution, TPU-native.

Replaces reference src/dynamics/tebd_evolution.py (CustomFloquet +
TEBDEvolution).  The key structural inversion (SURVEY.md section 7):

  * reference: Python loop over periods, one TeNPy gate-apply + MPS copy per
    bond, full MPS copy stored per period (tebd_evolution.py:239-247);
  * here: ONE jit-compiled ``lax.scan`` over periods, batched bond updates,
    observables computed in-scan so no state history is materialized.

The info-dict contract of the reference (wall_time, bond_dimensions,
periods_per_second, final_bond_dim, n_periods; tebd_evolution.py:251-257) is
preserved.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import gates as G
from ..core.mps import (MPS, bond_dimensions, entanglement_entropy,
                        expectation_one_site, max_bond_dimension, overlap)
from ..core.truncate import (PROJECTED_SVD_METHODS, TruncParams,
                             apply_bond_gates)
from ..models.kicked_ising import FloquetGates, floquet_period
from ..ops import cpx
from ..ops.cpx import C


@partial(jax.jit, static_argnames=("n_periods", "tp", "with_states", "frame",
                                   "measure_every", "measure_phase",
                                   "correlation_site"))
def evolve_floquet_scan(psi0: MPS, gates: FloquetGates, n_periods: int,
                        tp: TruncParams, with_states: bool = False,
                        frame: str = "strict", ref_state: MPS | None = None,
                        measure_every: int = 1, measure_phase: int = -1,
                        correlation_site: int | None = None):
    """Scan U_F^n with in-scan observables.

    ``correlation_site=i`` adds a ``zz_corr [n_meas, L]`` trace: the full
    <sigma^z_i sigma^z_j> profile per measurement (core/observables.
    zz_correlation_profile -- two transfer scans, no state history; the
    reference needs materialized states for this).  Exact in BOTH frames:
    the merged frame's H is z-diagonal and commutes with every sigma^z.

    Returns (final MPS, traces) where traces hold per-measurement arrays
    *excluding* the initial state (prepended host-side): sz_sites
    [n_meas, L], loschmidt_echo [n_meas], entropies [n_meas, L+1], max_chi
    [n_meas], trunc_err [n_meas], and optionally the full state history.

    measure_every=m > 1 evolves m periods per scan step and computes
    observables ONLY at measurement points (the round-1 version computed
    them every period and discarded host-side); requires
    n_periods % m == 0.  Every trace entry -- including trunc_err, which
    holds the per-period error of the MEASURED period -- equals the dense
    (m=1) trace sampled at the measurement grid, so sparse and dense
    measurement are interchangeable.  measure_phase selects the period
    WITHIN each
    block after which observables are taken (0-based; default -1 = last,
    i.e. measurement j at period (j+1)*m).  measure_phase=0 reproduces the
    reference's storage grid (periods 1, m+1, 2m+1, ...; tebd_evolution.
    py:242-246 stores when period % measure_every == 0) -- that is what
    ``CustomFloquet.evolve_floquet_traces`` uses.

    frame='merged' evolves in the half-step frame (kicked_ising.
    floquet_period_merged): one Ising sweep per period instead of two
    (~2x faster), with sz/magnetization/staggered/LE traces EXACTLY equal
    to the strict frame; entropies/max_chi traces are those of the
    half-step-shifted state.  The returned final MPS is mapped back to the
    physical frame (one H^{-1} at the end).  Requires diagonal bond gates
    (kicked-Ising); incompatible with with_states.

    ref_state: Loschmidt-echo reference (defaults to psi0); chunked drivers
    pass the global t=0 state here.
    """
    sz_op = G.pauli_c("z", psi0.dtype)
    if ref_state is None:
        ref_state = psi0
    m = int(measure_every)
    if m < 1 or n_periods % m != 0:
        raise ValueError(f"measure_every={m} must divide n_periods={n_periods}")
    n_meas = n_periods // m
    phase = (m - 1) if measure_phase < 0 else int(measure_phase)
    if not 0 <= phase < m:
        raise ValueError(f"measure_phase={measure_phase} outside block of {m}")

    if frame == "merged":
        if with_states:
            raise ValueError("frame='merged' cannot return state history")
        from ..models.kicked_ising import (floquet_period_merged,
                                           ising_half_step,
                                           ising_half_step_inverse)

        phi_ref, _ = ising_half_step(ref_state, gates, tp)
        phi0, e0 = ising_half_step(psi0, gates, tp)

        def block_fn(phi, _):
            out = None
            for _i in range(m):
                phi, e = floquet_period_merged(phi, gates, tp)
                if _i == phase:
                    sz = expectation_one_site(phi, sz_op).re
                    le = cpx.abs2(overlap(phi_ref, phi))
                    ent = entanglement_entropy(phi)
                    out = dict(sz_sites=sz, loschmidt_echo=le, entropies=ent,
                               max_chi=max_bond_dimension(phi),
                               trunc_err=e)
                    if correlation_site is not None:
                        from ..core.observables import zz_correlation_profile

                        out["zz_corr"] = zz_correlation_profile(
                            phi, correlation_site)
            return phi, out

        phi_final, traces = jax.lax.scan(block_fn, phi0, None,
                                         length=n_meas)
        psi_final, e_exit = ising_half_step_inverse(phi_final, gates, tp)
        # frame-change bookkeeping error: the entry/exit half-steps can
        # truncate real weight when the padded chi sits at the true rank
        # (each chi-staged CHUNK pays one entry+exit).  Kept separate from
        # the per-period trace so sparse/dense grids stay interchangeable;
        # the staged drivers fold it into their saturation signal.
        traces["trunc_err_boundary"] = e0 + e_exit
        return psi_final, traces

    def block_fn(psi, _):
        out = None
        for _i in range(m):
            psi, e = floquet_period(psi, gates, tp)
            if _i == phase:
                sz = expectation_one_site(psi, sz_op).re
                le = cpx.abs2(overlap(ref_state, psi))
                ent = entanglement_entropy(psi)
                out = dict(sz_sites=sz, loschmidt_echo=le, entropies=ent,
                           max_chi=max_bond_dimension(psi),
                           trunc_err=e)
                if correlation_site is not None:
                    from ..core.observables import zz_correlation_profile

                    out["zz_corr"] = zz_correlation_profile(
                        psi, correlation_site)
                if with_states:
                    out["states"] = psi
        return psi, out

    psi_final, traces = jax.lax.scan(block_fn, psi0, None, length=n_meas)
    # strict frame has no frame-change half-steps; keep the key for a
    # uniform trace contract across frames
    traces["trunc_err_boundary"] = jnp.zeros((), psi0.lam.dtype)
    return psi_final, traces


@partial(jax.jit, static_argnames=("n_periods", "tp", "anchor", "frame",
                                   "measure_every"))
def evolve_two_time_zz(psi0: MPS, gates: FloquetGates, n_periods: int,
                       tp: TruncParams, anchor: int, frame: str = "strict",
                       measure_every: int = 1):
    """Two-time correlator traces C(r, t) = <sz_anchor(0) sz_j(t)>.

    THE standard DTC order-parameter diagnostic: in a time crystal the
    two-time map alternates at f_drive/2 with O(1) amplitude, so its
    structure factor (core.observables.dynamic_structure_factor of the
    REAL part) peaks at (k = pi, f = f_drive/2).  The equal-time map
    (``correlation_site=...`` traces) cannot show this -- both spins flip
    together, leaving only O(pulse-imperfection) subharmonic weight.  The
    reference has no two-time machinery at all (its observables,
    reference src/core/observables.py:74-121, are equal-time on
    materialized states).

    Evolves |psi(t)> = U^t |psi0> and |phi(t)> = U^t sz_anchor |psi0>
    side by side in ONE ``lax.scan`` (2x the single-state cost) and reads
    off <phi(t)| sz_j |psi(t)> for all j per measurement
    (core.observables.cross_sz_profile).  frame='merged' is exact for
    this readout: the half-step frame change W is z-diagonal, so
    W^dag sz_j W = sz_j on the cross expectation, same argument as the
    equal-time map.

    Returns (psi_final, traces): zz2t_re / zz2t_im [n_meas, L] (the
    correlator is complex -- sz_anchor(0) and sz_j(t) do not commute),
    max_chi [n_meas] (of psi), trunc_err [n_meas] (psi + phi summed).
    Rows are t = measure_every*2tau, ...; the t=0 row is the REAL
    equal-time profile zz_correlation_profile(psi0, anchor) (at t=0 the
    two coincide) -- callers prepend it host-side.
    """
    from ..core.observables import cross_sz_profile
    from ..core.mps import apply_sz

    m = int(measure_every)
    if m < 1 or n_periods % m != 0:
        raise ValueError(f"measure_every={m} must divide n_periods={n_periods}")
    n_meas = n_periods // m

    phi0 = apply_sz(psi0, anchor)
    if frame == "merged":
        from ..models.kicked_ising import (floquet_period_merged,
                                           ising_half_step,
                                           ising_half_step_inverse)

        psi_m, e_psi0 = ising_half_step(psi0, gates, tp)
        phi_m, e_phi0 = ising_half_step(phi0, gates, tp)

        def block_fn(carry, _):
            psi, phi = carry
            e_tot = jnp.zeros((), psi.lam.dtype)
            for _i in range(m):
                psi, e1 = floquet_period_merged(psi, gates, tp)
                phi, e2 = floquet_period_merged(phi, gates, tp)
                e_tot = e_tot + e1 + e2
            c = cross_sz_profile(phi, psi)
            out = dict(zz2t_re=c.re, zz2t_im=c.im,
                       max_chi=max_bond_dimension(psi), trunc_err=e_tot)
            return (psi, phi), out

        (psi_m, phi_m), traces = jax.lax.scan(block_fn, (psi_m, phi_m),
                                              None, length=n_meas)
        psi_final, e_exit = ising_half_step_inverse(psi_m, gates, tp)
        traces["trunc_err_boundary"] = e_psi0 + e_phi0 + e_exit
        return psi_final, traces

    def block_fn(carry, _):
        psi, phi = carry
        e_tot = jnp.zeros((), psi.lam.dtype)
        for _i in range(m):
            psi, e1 = floquet_period(psi, gates, tp)
            phi, e2 = floquet_period(phi, gates, tp)
            e_tot = e_tot + e1 + e2
        c = cross_sz_profile(phi, psi)
        out = dict(zz2t_re=c.re, zz2t_im=c.im,
                   max_chi=max_bond_dimension(psi), trunc_err=e_tot)
        return (psi, phi), out

    (psi_final, _), traces = jax.lax.scan(block_fn, (psi0, phi0), None,
                                          length=n_meas)
    traces["trunc_err_boundary"] = jnp.zeros((), psi0.lam.dtype)
    return psi_final, traces


def _initial_observables(psi0: MPS, correlation_site: int | None = None) -> dict:
    from ..core.observables import zz_correlation_profile

    sz_op = G.pauli_c("z", psi0.dtype)
    out = dict(
        sz_sites=expectation_one_site(psi0, sz_op).re,
        loschmidt_echo=cpx.abs2(overlap(psi0, psi0)),
        entropies=entanglement_entropy(psi0),
        max_chi=max_bond_dimension(psi0),
        trunc_err=jnp.zeros((), dtype=psi0.lam.dtype),
    )
    if correlation_site is not None:
        out["zz_corr"] = zz_correlation_profile(psi0, correlation_site)
    return out


class CustomFloquet:
    """Custom Floquet evolution for the kicked-Ising model.

    API parity with reference tebd_evolution.py:191-258; the heavy path is a
    single fused device program.
    """

    def __init__(self, kicked_ising_model, trunc_params: dict | TruncParams | None = None):
        self.model = kicked_ising_model
        if isinstance(trunc_params, TruncParams):
            self.trunc_params = trunc_params
        elif trunc_params is None:
            self.trunc_params = TruncParams(chi_max=100, svd_min=1e-12, trunc_cut=1e-10)
        else:
            # a PARTIAL dict keeps the None-path defaults for missing keys
            # (from_dict alone maps a missing chi_max to 0 = uncapped --
            # different physics than the documented reference defaults)
            d = dict(trunc_params)
            d.setdefault("chi_max", 100)
            d.setdefault("trunc_cut", 1e-10)
            self.trunc_params = TruncParams.from_dict(d)

    def evolve_floquet_traces(self, psi_initial: MPS, n_periods: int,
                              measure_every: int = 1,
                              correlation_site: int | None = None
                              ) -> Tuple[Dict, List[float], Dict]:
        """Fused path: observable traces without materializing states.

        Returns (traces, times, info).  traces arrays have length
        n_stored + 1 (initial state included, as the reference's states list
        does, tebd_evolution.py:231).

        measure_every=m > 1 measures IN-SCAN at the reference's storage
        grid (after periods 1, m+1, 2m+1, ...; measure_phase=0) when m
        divides n_periods -- observables cost n/m evaluations instead of n.
        A non-dividing m falls back to dense measurement + host-side
        selection with identical traces.

        ``correlation_site=i`` adds a ``zz_corr [n_stored+1, L]`` trace:
        <sigma^z_i sigma^z_j(t)> for all j, measured in-scan (the C(r, t)
        map the reference can only build from materialized states).
        """
        start = time.time()
        if measure_every > 1 and n_periods % measure_every == 0:
            psi_final, tr = evolve_floquet_scan(
                psi_initial, self.model.gates, n_periods, self.trunc_params,
                measure_every=measure_every, measure_phase=0,
                correlation_site=correlation_site)
            sel = np.arange(n_periods // measure_every)
            periods = sel * measure_every          # measurement j at period j*m+1
        else:
            psi_final, tr = evolve_floquet_scan(psi_initial, self.model.gates,
                                                n_periods, self.trunc_params,
                                                correlation_site=correlation_site)
            sel = np.arange(0, n_periods, measure_every)
            periods = sel
        jax.block_until_ready(tr["loschmidt_echo"])
        wall_time = time.time() - start

        init = _initial_observables(psi_initial, correlation_site)
        keys = ("sz_sites", "loschmidt_echo", "entropies", "max_chi",
                "trunc_err") + (("zz_corr",) if correlation_site is not None
                                else ())
        traces = {}
        for k in keys:
            full = np.asarray(tr[k])[sel]
            traces[k] = np.concatenate([np.asarray(init[k])[None], full], axis=0)
        from ..core.observables import add_derived_magnetization

        add_derived_magnetization(traces, psi_initial.L)

        times = [0.0] + [(int(p) + 1) * 2 * self.model.tau for p in periods]
        bond_dims = [int(x) for x in traces["max_chi"]]
        info = {
            "wall_time": wall_time,
            "bond_dimensions": bond_dims,
            "periods_per_second": n_periods / wall_time if wall_time > 0 else float("inf"),
            "final_bond_dim": bond_dims[-1],
            "n_periods": n_periods,
            "truncation_errors": traces["trunc_err"].tolist(),
        }
        return traces, times, info

    def evolve_floquet(self, psi_initial: MPS, n_periods: int,
                       measure_every: int = 1) -> Tuple[List[MPS], List[float], Dict]:
        """Reference-contract path returning the state history
        (tebd_evolution.py:218-258).  Memory scales with the number of
        STORED states: when measure_every divides n_periods the scan
        stores states in-scan only at the measurement grid (an
        measure_every-fold device-memory cut); otherwise every period is
        stored and subsampled host-side.  Prefer ``evolve_floquet_traces``
        for long runs."""
        start = time.time()
        m = int(measure_every)
        in_scan = m > 1 and n_periods % m == 0
        psi_final, tr = evolve_floquet_scan(
            psi_initial, self.model.gates, n_periods, self.trunc_params,
            with_states=True,
            measure_every=m if in_scan else 1,
            measure_phase=0 if in_scan else -1)
        jax.block_until_ready(psi_final.B.re)
        wall_time = time.time() - start

        stacked: MPS = tr["states"]
        states = [psi_initial]
        times = [0.0]
        bond_dims = [int(np.max(np.asarray(bond_dimensions(psi_initial))[1:-1], initial=1))]
        max_chi = np.asarray(tr["max_chi"])
        if in_scan:     # stored entry j == state after period j*m + 1
            pairs = [(j, j * m) for j in range(n_periods // m)]
        else:           # dense storage, host-side subsampling
            pairs = [(p, p) for p in range(0, n_periods, m)]
        for j, p in pairs:
            states.append(MPS(B=stacked.B[j], lam=stacked.lam[j]))
            times.append((p + 1) * 2 * self.model.tau)
            bond_dims.append(int(max_chi[j]))

        info = {
            "wall_time": wall_time,
            "bond_dimensions": bond_dims,
            "periods_per_second": n_periods / wall_time if wall_time > 0 else float("inf"),
            "final_bond_dim": bond_dims[-1],
            "n_periods": n_periods,
        }
        return states, times, info


def _next_chi(chi: int, cap: int, growth: float) -> int:
    """Next padded chi on the escalation ladder: ceil(chi * growth)
    rounded UP to a multiple of 4, clamped to [chi+4, cap].

    growth < 2 trades extra stage compiles for tighter padding (the
    bench's x1.5 ladder 32->48->72 measured 1.3x the x2 ladder); the
    chunk re-run rule keeps any ladder exact.  chi is kept a multiple
    of 4 so the Jacobi kernel width n = 2*chi is a multiple of 8, the
    f32 sublane tile -- unaligned widths (n=324, 486) are verified
    correct on the compiled kernel but aligned ones avoid padding
    waste inside Mosaic."""
    nc = int(np.ceil(chi * growth))
    nc = ((nc + 3) // 4) * 4
    return min(cap, max(chi + 4, nc))


def _stage_err_tol(dtype, svd_min: float = 0.0, bonds: int = 10) -> float:
    """Escalation threshold on per-period truncation error for chi-staged
    drivers: far above the dtype's SVD noise floor (junk discarded weight
    ~ n * (eps * sigma_max)^2), far below any physically meaningful
    truncation (the rank boundary discards >= 1e-6 weight when hit).

    With a coarse ``svd_min`` (intentional lossy truncation, e.g. 1e-4)
    every period legitimately discards ~bonds * svd_min^2 of weight; the
    threshold scales with that floor -- INCLUDING the chain's bond count,
    so long chains don't read routine svd_min trimming as saturation --
    and the driver doesn't escalate to the cap over ordinary lossy
    evolution (calibrated floors 1e-8/1e-20 assume svd_min at the dtype
    noise level, where the floor term dominates regardless of L)."""
    floor = 1e-8 if jnp.dtype(dtype) == jnp.dtype(jnp.float32) else 1e-20
    return max(floor, 10.0 * max(int(bonds), 1) * float(svd_min) ** 2)


def _stage_decision(trunc_err, exit_lam, chi: int, err_tol: float):
    """(saturated, ahead) escalation decision for chi-staged drivers.

    ``saturated``: some period in the chunk discarded more than ``err_tol``
    of squared Schmidt weight -- the padding truncated real entanglement
    and the chunk must re-run wider.  ``ahead``: the chunk stayed exact but
    the chunk-exit state's SIGNIFICANT rank (lam > 1e-5 x per-bond max;
    f32 junk singular values sit at ~1e-6..1e-7 of sigma_max and must not
    count) fills >= 15/16 of the padding -- grow before the next chunk
    certainly truncates.

    Two measured failure modes shaped these thresholds (L=40 chi=256
    window, axon TPU):
      * raw slot occupancy is the WRONG saturation criterion in f32: junk
        sigmas pass the svd_min=1e-7 relative floor and fill every padded
        slot within a few periods, forcing runaway escalation
        (chi 32->64->128 inside the first 5 periods, true rank < 32);
      * an EAGER ahead trigger (3/4 occupancy) is a net loss: a re-run
        costs one chunk at the old (8x cheaper) chi, while escalating a
        stage early costs every remaining period at the wider chi
        (measured 13.6 vs 11.4 chain-p/s merely from the first fix; the
        3/4 trigger still burned periods 5-20 at chi=128 when rank ~48
        fit chi=64)."""
    saturated = bool(np.max(np.asarray(trunc_err)) > err_tol)
    lam = np.asarray(exit_lam)
    lam_max = np.max(lam, axis=-1, keepdims=True)
    sig = np.sum(lam > 1e-5 * lam_max, axis=-1)
    ahead = bool(np.max(sig) >= (15 * chi) // 16)
    return saturated, ahead


def evolve_floquet_auto(model_kwargs: dict, state_type: str, n_periods: int,
                        trunc_params: dict | TruncParams | None = None,
                        chi_start: int = 16, chi_limit: int = 256,
                        measure_every: int = 1, chunk_periods: int = 16,
                        checkpoint_dir: str | None = None,
                        frame: str = "strict", growth: float = 2.0,
                        cap_svd_method: str | None = None,
                        state_rng: np.random.Generator | None = None):
    """Chi-escalation driver: evolve at a small padded chi and escalate to
    2x whenever the effective bond dimension saturates the padding.

    Fixed-shape XLA programs cannot grow chi adaptively the way the
    reference's TeNPy objects do (reference src/dynamics/tebd_evolution.py
    lets TeNPy grow chi per bond); this host-side loop recovers the
    adaptive behavior -- and with it the large transient win: the
    entangling L=40 workload's theta rank stays < 64 for ~20 periods
    (baselines/proj_leak_profile.py), so padding at the final chi from
    t=0 pays ~(chi/rank)^3 wasted kernel work.  Evolution proceeds in
    chunks of ``chunk_periods``; when a chunk saturates the padding, the
    PRE-CHUNK state (still exact) is zero-padded to the doubled chi
    (core/mps.pad_mps) and only that chunk re-runs -- no restart from t=0.
    For the reference's exact-pi-pulse configs the dynamics stays rank-1
    and the first (cheapest) level always suffices.

    frame='merged' runs each chunk in the half-step Floquet frame (one
    Ising sweep per period instead of two; sz/staggered/LE traces exact,
    entropy/chi traces mid-frame) at ~0.5/chunk_periods relative overhead
    for the frame entry/exit half-steps per chunk.

    ``checkpoint_dir``: when set, the running state is persisted after each
    completed chunk (utils/checkpoint.save_state) and an interrupted run
    resumes from the last checkpoint.

    ``cap_svd_method``: optional svd_method override for chunks that run
    AT the ladder cap (chi == chi_limit), where truncation error no longer
    drives escalation decisions.  'jacobi_core' (the core-matrix projected
    SVD, ops/pallas/jacobi_svd.jacobi_core) is the adopted
    saturated-steady-state path: ~5x the full kernel's throughput with a
    BETTER kept-weight class than the earlier 'jacobi_proj' (closed-loop
    staggered/LE deltas 7.9e-4/3.0e-4 over 50 periods at L=40 chi=256,
    PERFORMANCE.md round-3).  Projected-path trunc_err carries the f32
    Frobenius noise floor (~3e-4/period), so cap-stage trunc_err traces
    are measurement-noisy -- leave None for parity-grade runs.

    ``model_kwargs`` are KickedIsingModel arguments (without chi).
    Returns (traces, times, info, model); info gains 'chi_pad_used',
    'chi_escalations', and 'n_rerun_periods'.
    """
    from ..core.mps import pad_mps, product_state, state_basis_indices
    from ..models.kicked_ising import KickedIsingModel

    tp = trunc_params if isinstance(trunc_params, TruncParams) \
        else TruncParams.from_dict(trunc_params)
    cap = min(tp.chi_max if tp.chi_max else chi_limit, chi_limit)
    # clamp to cap (not just chi_limit): tp.chi_max < chi_start would
    # otherwise pad every tensor above the rank the truncation mask can
    # ever use AND disable escalation (chi < cap always False)
    chi = min(chi_start, cap)
    if jax.default_backend() != "cpu":
        # csvd's auto routing sends n = 2*chi < 32 to gram_eigh, whose
        # junk sigmas poison the escalation criteria (see sweep._stage_tp);
        # floor the ladder at chi=16 on the chip
        chi = min(max(chi, 16), cap)
    # fields drawn deterministically? (explicit h_fields or a seed) --
    # decides whether they belong in the resume fingerprint below
    caller_kwargs = dict(model_kwargs)
    fields_deterministic = ("h_fields" in caller_kwargs
                            or caller_kwargs.get("disorder_seed") is not None)

    start = time.time()
    model = KickedIsingModel(chi=chi, **model_kwargs)
    # Pin the disorder fields drawn by the FIRST model build: every ladder
    # rebuild below re-instantiates KickedIsingModel at the new chi, and a
    # seedless call (disorder_seed=None, no h_fields) would redraw fresh
    # fields from the global RNG mid-run -- silently changing the
    # Hamiltonian between chunks.  Passing the realized fields explicitly
    # makes every stage bit-identical.
    model_kwargs = dict(model_kwargs)
    model_kwargs["h_fields"] = model.h_fields
    model_kwargs.pop("disorder_seed", None)
    err_tol = _stage_err_tol(model.dtype, tp.svd_min, model.n_sites - 1)
    # realize the initial-state basis ONCE: 'random' draws fresh indices
    # per call, and the t=0 trace row, the Loschmidt reference across
    # ladder rebuilds, AND a checkpoint resume must all use THIS
    # realization (state_rng pins the draw for reproducible random states)
    basis_idx = state_basis_indices(model.n_sites, state_type, rng=state_rng)
    psi = product_state(basis_idx, chi=chi, dtype=model.dtype)
    psi0 = psi
    p_done = 0
    escalations: list = []
    n_rerun = 0
    chunks: list = []

    wall_prev = 0.0
    fingerprint = None
    if checkpoint_dir is not None:
        import hashlib

        from ..utils.checkpoint import (atomic_savez, load_state, save_state,
                                        state_exists)
        ck_state = os.path.join(checkpoint_dir, "auto_state")
        ck_traces = os.path.join(checkpoint_dir, "auto_traces.npz")
        # Everything that must MATCH between the original run and a resume
        # (only n_periods may change) -- same guard as evolve_batch_auto:
        # a shape-compatible checkpoint of a different Hamiltonian would
        # silently continue the wrong evolution.  Seedless fields are
        # excluded (they differ per process by construction and the resume
        # pins them from the checkpoint anyway); seeded/explicit fields
        # are included and catch a changed seed.
        fp_fields = (np.round(np.asarray(model.h_fields), 12).tolist()
                     if fields_deterministic else None)
        fp_kwargs = sorted(
            (k, repr(v)) for k, v in caller_kwargs.items()
            if k not in ("h_fields", "disorder_seed"))
        fp_src = repr((fp_kwargs, fp_fields, state_type, tp, chi_start,
                       chi_limit, measure_every, chunk_periods, frame,
                       growth)
                      # appended only when set: keeps default-run
                      # fingerprints (and old checkpoints) stable
                      + ((cap_svd_method,) if cap_svd_method else ())).encode()
        fingerprint = hashlib.sha256(fp_src).hexdigest()
        if state_exists(ck_state) and os.path.exists(ck_traces):
            psi, meta = load_state(ck_state)
            ck_fp = meta.get("fingerprint")
            if ck_fp is not None and ck_fp != fingerprint:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} was written by a run "
                    "with different parameters (model/state/trunc/ladder); "
                    "refusing to resume -- delete it or point elsewhere")
            p_done = int(meta["p_done"])
            chi = int(meta["chi"])
            escalations = list(meta.get("escalations", []))
            n_rerun = int(meta.get("n_rerun", 0))
            wall_prev = float(meta.get("wall_time", 0.0))
            if "h_fields" in meta:
                # the fields realized by the ORIGINAL run (a fresh process
                # with disorder_seed=None would otherwise redraw)
                model_kwargs["h_fields"] = np.asarray(meta["h_fields"])
            if "basis_idx" in meta:
                # the initial-state basis realized by the ORIGINAL run
                # (state_type='random' would otherwise redraw, corrupting
                # the Loschmidt reference of every resumed period)
                basis_idx = np.asarray(meta["basis_idx"], np.int32)
            model = KickedIsingModel(chi=chi, **model_kwargs)
            psi0 = product_state(basis_idx, chi=chi, dtype=model.dtype)
            with np.load(ck_traces) as z:
                # n_chunks derived from the npz itself: the traces file is
                # written (atomically) BEFORE the state, so it can only be
                # AHEAD of meta, never behind
                n_ck = len([k for k in z.files if k.startswith("sz_sites__")])
                chunks = [{k: z[f"{k}__{i}"] for k in
                           ("sz_sites", "loschmidt_echo", "entropies",
                            "max_chi", "trunc_err")}
                          for i in range(min(n_ck, int(meta["n_chunks"])))]

    while p_done < n_periods:
        n = min(chunk_periods, n_periods - p_done)
        # at the ladder cap escalation is over (chi < cap gates both
        # triggers), so the noisy-trunc_err fast path is safe to route
        if cap_svd_method and chi >= cap:
            tp_stage = tp._replace(svd_method=cap_svd_method)
        elif chi < cap and tp.svd_method in PROJECTED_SVD_METHODS:
            # BELOW the cap the escalation criteria read trunc_err off the
            # SVD output; projected methods report the f32 Frobenius noise
            # floor (~3e-4/period) instead of true discarded weight, which
            # sits above _stage_err_tol and would poison every decision
            # (the exact misuse core/truncate.py:52-57 warns about, now
            # overridden here instead of silently permitted).  Projected
            # paths are reachable only via cap_svd_method / an at-cap tp.
            tp_stage = tp._replace(svd_method="jacobi")
        else:
            tp_stage = tp
        # LE referenced to the t=0 state, not the chunk start
        psi_next, tr = evolve_floquet_scan(psi, model.gates, n, tp_stage,
                                           ref_state=psi0, frame=frame)
        # ONE host round-trip for the whole chunk (each np.asarray pays a
        # ~25 ms tunnel latency; the traces dict has 5 arrays)
        tr, exit_lam = jax.device_get((tr, psi_next.lam))
        # Escalation criteria (see _stage_decision): truncation error for
        # the re-run trigger, significant chunk-exit occupancy for the
        # grow-ahead trigger.  Slot counts alone misfire in f32: junk
        # singular values ~eps*sigma_max pass the svd_min=1e-7 floor and
        # fill the padding without carrying weight.
        # include the merged-frame chunk-boundary half-step error: entry/
        # exit can truncate real weight the per-period trace never sees
        errs = np.append(np.ravel(tr["trunc_err"]),
                         np.ravel(tr.get("trunc_err_boundary", 0.0)))
        saturated, ahead = _stage_decision(errs, exit_lam, chi, err_tol)
        if saturated and chi < cap:
            # the chunk truncated real weight -> discard it and re-run from
            # the (still exact) pre-chunk state at 2x chi
            new_chi = _next_chi(chi, cap, growth)
            escalations.append({"period": p_done, "from": chi, "to": new_chi})
            n_rerun += n
            chi = new_chi
            model = KickedIsingModel(chi=chi, **model_kwargs)
            psi = pad_mps(psi, chi)
            psi0 = pad_mps(psi0, chi)
            continue                      # re-run this chunk at the new chi
        if ahead and chi < cap and p_done + n < n_periods:
            # escalate-ahead: the chunk is still exact (no real weight
            # truncated), so KEEP it and grow chi for the next chunk --
            # avoids the re-run that waiting for saturation would cost
            new_chi = _next_chi(chi, cap, growth)
            escalations.append({"period": p_done + n, "from": chi,
                                "to": new_chi, "ahead": True})
            chi = new_chi
            model = KickedIsingModel(chi=chi, **model_kwargs)
            psi_next = pad_mps(psi_next, chi)
            psi0 = pad_mps(psi0, chi)
        psi = psi_next
        chunks.append(tr)
        p_done += n
        if checkpoint_dir is not None:
            # traces first (atomic), then the state: a kill between the two
            # leaves traces AHEAD of meta, which the loader reconciles by
            # taking min(n_chunks) -- never a KeyError/BadZipFile
            flat = {}
            for i, c in enumerate(chunks):
                for k in ("sz_sites", "loschmidt_echo", "entropies",
                          "max_chi", "trunc_err"):
                    flat[f"{k}__{i}"] = c[k]
            atomic_savez(ck_traces, **flat)
            save_state(ck_state, psi,
                       {"p_done": p_done, "chi": chi,
                        "escalations": escalations,
                        "n_chunks": len(chunks),
                        "n_rerun": n_rerun,
                        "wall_time": wall_prev + (time.time() - start),
                        "fingerprint": fingerprint,
                        "h_fields": np.asarray(model.h_fields).tolist(),
                        "basis_idx": np.asarray(basis_idx).tolist()})

    wall_time = wall_prev + (time.time() - start)

    init = _initial_observables(product_state(basis_idx, chi=chi,
                                              dtype=model.dtype))
    trace_keys = ("sz_sites", "loschmidt_echo", "entropies", "max_chi",
                  "trunc_err")
    if chunks:
        tr_all = {k: np.concatenate([c[k] for c in chunks], axis=0)
                  for k in trace_keys}
    else:       # n_periods == 0: initial-row-only traces, same contract
        tr_all = {k: np.zeros((0,) + np.asarray(init[k]).shape,
                              dtype=np.asarray(init[k]).dtype)
                  for k in trace_keys}
    sel = np.arange(0, n_periods, measure_every)
    traces = {}
    for k in ("sz_sites", "loschmidt_echo", "entropies", "max_chi",
              "trunc_err"):
        traces[k] = np.concatenate([np.asarray(init[k])[None],
                                    tr_all[k][sel]], axis=0)
    from ..core.observables import add_derived_magnetization

    add_derived_magnetization(traces, model.n_sites)
    times = [0.0] + [(int(p) + 1) * 2 * model.tau for p in sel]
    bond_dims = [int(x) for x in traces["max_chi"]]
    info = {
        "wall_time": wall_time,
        "bond_dimensions": bond_dims,
        "periods_per_second": n_periods / wall_time if wall_time > 0 else float("inf"),
        "final_bond_dim": bond_dims[-1],
        "n_periods": n_periods,
        "truncation_errors": traces["trunc_err"].tolist(),
        "chi_pad_used": chi,
        "chi_escalations": escalations,
        "n_rerun_periods": n_rerun,
    }
    return traces, times, info, model


# ---------------------------------------------------------------------------
# Generic nearest-neighbor Suzuki-Trotter TEBD (reference TEBDEvolution)
# ---------------------------------------------------------------------------

class NearestNeighborModel:
    """A chain Hamiltonian H = sum_b H_b with H_b acting on sites (b, b+1).

    The TPU analog of a TeNPy ``NearestNeighborModel``: just the dense bond
    Hamiltonians [L-1, d*d, d*d] (onsite terms already absorbed into bonds).
    """

    def __init__(self, bond_H: np.ndarray, d: int = 2):
        self.bond_H = np.asarray(bond_H)
        self.d = d
        self.L = self.bond_H.shape[0] + 1

    def trotter_gates(self, dt: float, dtype=jnp.float32,
                      imag: bool = False) -> C:
        """exp(-i dt H_b) for every bond, C[L-1, d, d, d, d].

        ``imag=True`` returns the imaginary-time (non-unitary) gates
        exp(-dt H_b) used by dynamics/ground_state.py."""
        t = -1j * dt if imag else dt
        g = np.stack([G.expm_two_site(H, t) for H in self.bond_H])
        d = self.d
        return G.gate_from_numpy(g.reshape(-1, d, d, d, d), dtype=dtype)

    def bond_terms(self, dtype=jnp.float32) -> C:
        """The dense bond Hamiltonians as a device C[L-1, d, d, d, d]
        tensor in the gate index convention, for
        core.observables.bond_energies / total_energy."""
        d = self.d
        return G.gate_from_numpy(
            self.bond_H.reshape(-1, d, d, d, d), dtype=dtype)


def spin_chain_model(L: int, Jx=0.0, Jy=0.0, Jz=1.0, hx=0.0, hz=0.0,
                     hz_fields: np.ndarray | None = None) -> NearestNeighborModel:
    """Spin-1/2 chain H = sum Jx SxSx + Jy SySy + Jz SzSz + hx Sx + hz Sz.

    TPU equivalent of the TeNPy ``SpinChain`` the pyc-only TDVP module builds
    (SURVEY.md component 13, _create_tenpy_model).  S = sigma/2.  Onsite
    terms are split half/half onto adjacent bonds; edge sites put their full
    weight on their only bond.
    """
    Sx, Sy, Sz = G.SIGMA_X / 2, G.SIGMA_Y / 2, G.SIGMA_Z / 2
    I = np.eye(2, dtype=complex)
    hzv = np.full(L, hz, dtype=float) if hz_fields is None else np.asarray(hz_fields)
    bonds = []
    for b in range(L - 1):
        H = (Jx * np.kron(Sx, Sx) + Jy * np.kron(Sy, Sy) + Jz * np.kron(Sz, Sz))
        wl = 1.0 if b == 0 else 0.5
        wr = 1.0 if b == L - 2 else 0.5
        H += wl * (hx * np.kron(Sx, I) + hzv[b] * np.kron(Sz, I))
        H += wr * (hx * np.kron(I, Sx) + hzv[b + 1] * np.kron(I, Sz))
        bonds.append(H)
    return NearestNeighborModel(np.stack(bonds))


@partial(jax.jit, static_argnames=("n_steps", "tp"))
def trotter2_scan(psi0: MPS, gates_half: C, gates_full: C,
                  n_steps: int, tp: TruncParams):
    """Second-order Suzuki-Trotter: even(dt/2) odd(dt) even(dt/2) per step,
    with in-scan entropy/chi/truncation tracking (reference
    tebd_evolution.py:67-95 uses TeNPy's order-2 TEBDEngine)."""

    def step_fn(psi, _):
        psi, e1 = apply_bond_gates(psi, gates_half, start=0, tp=tp)
        psi, e2 = apply_bond_gates(psi, gates_full, start=1, tp=tp)
        psi, e3 = apply_bond_gates(psi, gates_half, start=0, tp=tp)
        ent = entanglement_entropy(psi)
        chi_eff = max_bond_dimension(psi)
        return psi, dict(entropies=ent, max_chi=chi_eff, trunc_err=e1 + e2 + e3)

    return jax.lax.scan(step_fn, psi0, None, length=n_steps)


class TEBDEvolution:
    """TEBD evolution wrapper (API parity: reference tebd_evolution.py:18-188).

    ``model`` is either a NearestNeighborModel (generic Trotter path) or a
    KickedIsingModel (for ``evolve_floquet_period``).
    """

    def __init__(self, model, dt: float = 0.1, max_chi: int = 100,
                 trunc_params: dict | TruncParams | None = None):
        self.model = model
        self.dt = dt
        self.max_chi = max_chi
        if isinstance(trunc_params, TruncParams):
            self.trunc_params = trunc_params
        elif trunc_params is None:
            self.trunc_params = TruncParams(chi_max=max_chi, svd_min=1e-12, trunc_cut=1e-10)
        else:
            d = dict(trunc_params)
            d.setdefault("chi_max", max_chi)
            self.trunc_params = TruncParams.from_dict(d)

    def evolve(self, psi_initial: MPS, total_time: float,
               observe_every: int = 1) -> Tuple[List[MPS], List[float], Dict]:
        """Order-2 Trotter evolution returning (states, times, info);
        info keys follow reference tebd_evolution.py:99-106."""
        n_steps = int(total_time / self.dt)
        gates_half = self.model.trotter_gates(self.dt / 2, dtype=psi_initial.dtype)
        gates_full = self.model.trotter_gates(self.dt, dtype=psi_initial.dtype)

        start = time.time()
        # states contract requires history: step in python, jit inner step
        states = [psi_initial]
        times = [0.0]
        bond_dims = [np.asarray(bond_dimensions(psi_initial))]
        entropies = [np.asarray(entanglement_entropy(psi_initial))]
        trunc_errs = []
        psi = psi_initial
        for step in range(n_steps):
            psi, tr = trotter2_scan(psi, gates_half, gates_full, 1, self.trunc_params)
            if step % observe_every == 0:
                states.append(psi)
                times.append((step + 1) * self.dt)
                bond_dims.append(np.asarray(bond_dimensions(psi)))
                entropies.append(np.asarray(tr["entropies"])[0])
            trunc_errs.append(float(tr["trunc_err"][0]))
        wall_time = time.time() - start

        info = {
            "wall_time": wall_time,
            "bond_dimensions": bond_dims,
            "entanglement_entropies": entropies,
            "truncation_errors": float(np.sum(trunc_errs)),
            # scalar, like every other driver in this file (the per-bond
            # profile is info['bond_dimensions'][-1])
            "final_bond_dim": int(np.max(np.asarray(bond_dimensions(psi)))),
            "n_steps": n_steps,
        }
        return states, times, info

    def evolve_traces(self, psi_initial: MPS, total_time: float) -> Tuple[Dict, Dict]:
        """Fused fast path: full scan on device, traces only."""
        n_steps = int(total_time / self.dt)
        gates_half = self.model.trotter_gates(self.dt / 2, dtype=psi_initial.dtype)
        gates_full = self.model.trotter_gates(self.dt, dtype=psi_initial.dtype)
        start = time.time()
        psi, tr = trotter2_scan(psi_initial, gates_half, gates_full, n_steps,
                                self.trunc_params)
        jax.block_until_ready(psi.B.re)
        wall_time = time.time() - start
        info = {"wall_time": wall_time, "n_steps": n_steps,
                "steps_per_second": n_steps / wall_time if wall_time > 0 else float("inf")}
        return {k: np.asarray(v) for k, v in tr.items()}, info

    def real_time_evolution(self, psi_initial: MPS, hamiltonian, total_time: float,
                            observe_every: int = 1):
        """Reference tebd_evolution.py:110-126 delegates to evolve; preserved."""
        return self.evolve(psi_initial, total_time, observe_every)

    def suzuki_trotter_gates(self, hamiltonian_terms: Dict, dt: float) -> List[np.ndarray]:
        """Construct exp(-i dt H_term) gates (reference tebd_evolution.py:128-149)."""
        return [G.expm_two_site(np.asarray(op), dt)
                for name, op in hamiltonian_terms.items()
                if name != "single_site_terms" and isinstance(op, np.ndarray)]

    def benchmark_performance(self, psi_initial: MPS, n_steps: int = 100) -> Dict:
        """Performance metrics (reference tebd_evolution.py:151-176)."""
        total_time = n_steps * self.dt
        tr, info = self.evolve_traces(psi_initial, total_time)
        return {
            "wall_time": info["wall_time"],
            "steps_per_second": info["steps_per_second"],
            "final_bond_dim": int(tr["max_chi"][-1]),
            "memory_usage": float(np.sum(tr["max_chi"]) * 8 / 1024**2),
            "truncation_error": float(tr["trunc_err"][-1]),
        }

    def evolve_floquet_period(self, psi: MPS) -> MPS:
        """One Floquet period via the model (reference tebd_evolution.py:178-188)."""
        return self.model.floquet_step(psi, self.trunc_params)
