"""Imaginary-time TEBD ground-state preparation, TPU-native.

The reference README advertises "real and imaginary-time evolution
algorithms for ground state preparation and dynamics", but its code only
ever runs TeNPy's TEBDEngine with a real time step (reference
src/dynamics/tebd_evolution.py:66-106 -- no imaginary-time call site
exists anywhere in the repository).  This module supplies the advertised
capability the TPU way:

  * the non-unitary Trotter gates exp(-dt H_b) ride the SAME batched
    Hastings bond update as real-time evolution
    (core/truncate.apply_bond_gates).  The Hastings identity
    B_l_new = theta_tilde . V = lam_l^{-1} U S needs only theta =
    lam_l . theta_tilde and orthonormal SVD columns -- both
    gate-independent -- so no separate non-unitary code path is needed;
  * ``TruncParams.renormalize=True`` (the default) renormalizes the kept
    Schmidt vector on every bond update, which is exactly the per-step
    norm restoration imaginary-time evolution requires;
  * each ladder leg is ONE ``lax.scan`` program with an in-scan energy
    trace (core.observables.bond_energies: one batched einsum over the
    bond axis), so convergence monitoring costs no host round-trips;
  * the dt ladder (TeNPy-style: coarse steps to burn off excited weight,
    fine steps to shrink the O(dt^2) Trotter bias) is host-side control
    flow OUTSIDE jit -- each (dt, chunk) program is compiled once and
    re-run until the energy stalls.

Canonical-form caveat (standard for imaginary-time TEBD): non-unitary
gates degrade the B-form by O(dt) per sweep, which biases *observables*,
not the fixed point; the ladder ends at small dt where the bias is
negligible, and ``bond_energies`` divides by <theta|theta> per bond to
stay robust mid-ladder.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mps import (MPS, create_initial_state, entanglement_entropy,
                        haar_product_state)
from ..core.observables import bond_energies_exact
from ..core.truncate import TruncParams, apply_bond_gates
from ..ops.cpx import C
from .tebd import NearestNeighborModel


@partial(jax.jit, static_argnames=("n_steps", "tp"))
def imaginary_time_scan(psi0: MPS, gates_half: C, gates_full: C,
                        bond_H: C, n_steps: int, tp: TruncParams):
    """``n_steps`` second-order imaginary-time sweeps with an in-scan
    energy/entropy/truncation trace.

    Same even(dt/2) odd(dt) even(dt/2) pattern as the real-time
    ``trotter2_scan`` (dynamics/tebd.py), plus the energy observable.
    Returns (psi, traces) with traces = {energy, entropies, trunc_err}.
    """

    def step_fn(psi, _):
        psi, e1 = apply_bond_gates(psi, gates_half, start=0, tp=tp)
        psi, e2 = apply_bond_gates(psi, gates_full, start=1, tp=tp)
        psi, e3 = apply_bond_gates(psi, gates_half, start=0, tp=tp)
        # exact environments: the canonical-form shortcut is O(dt) wrong
        # under non-unitary sweeps, while the variational quotient is
        # quadratic in the state error (see bond_energies_exact)
        tr = dict(energy=jnp.sum(bond_energies_exact(psi, bond_H)),
                  entropies=entanglement_entropy(psi),
                  trunc_err=e1 + e2 + e3)
        return psi, tr

    return jax.lax.scan(step_fn, psi0, None, length=n_steps)


def find_ground_state(model: NearestNeighborModel, chi: int = 32,
                      psi0: MPS | None = None,
                      state_type: str = "haar_product",
                      seed: int = 0, dts=(0.1, 0.01, 1e-3),
                      chunk_steps: int = 20, max_chunks_per_dt: int = 200,
                      e_tol: float | None = None,
                      tp: TruncParams | None = None,
                      dtype=jnp.float32):
    """Variational ground-state search by imaginary-time TEBD.

    Args:
      model: NearestNeighborModel (e.g. dynamics.tebd.spin_chain_model).
      chi: padded bond dimension of the search state.
      psi0: optional initial MPS; otherwise a ``state_type`` product state
        (default "haar_product": an independent Haar-random local unit
        vector per site, which has weight in EVERY symmetry sector --
        sector-pure starts like "neel" or "random" basis states trap the
        descent in their sector, e.g. total-Sz conservation in the
        Heisenberg chain).
      dts: the time-step ladder, coarse to fine.  Each leg runs until the
        energy change per chunk falls below ``e_tol * max(1, |E|)`` or
        ``max_chunks_per_dt`` chunks.
      e_tol: per-leg convergence tolerance; default is dtype-aware
        (1e-10 in f64, 1e-6 in f32 -- the f32 in-scan energy jitters at
        ~1e-7 relative, so a tighter f32 tolerance would never trigger:
        every leg would silently burn ``max_chunks_per_dt`` chunks and
        report ``converged=False``, disabling the Richardson step).
      chunk_steps: steps per compiled scan chunk (convergence is checked
        on the host between chunks; the chunk program compiles once per
        dt).
      tp: truncation parameters; default keeps every Schmidt value above
        the dtype noise floor with renormalization on.

    Returns:
      (psi, energy, info) -- ``energy`` is the final leg's fixed-point
      value (carries the final dt's O(dt^2) Trotter bias); info has the
      concatenated ``energy_trace``, per-leg fixed points
      (``leg_energies``), a Richardson dt->0 ``energy_extrapolated``
      (removes the leading Trotter bias when the last two legs
      converged), ``n_steps``, ``wall_time``, ``dts``, ``converged``
      flags per leg, and the final ``entropies`` profile.
    """
    if e_tol is None:
        e_tol = 1e-10 if jnp.dtype(dtype).itemsize >= 8 else 1e-6
    if tp is None:
        floor = 1e-14 if jnp.dtype(dtype).itemsize >= 8 else 1e-7
        tp = TruncParams(chi_max=0, svd_min=floor)
    if psi0 is None:
        rng = np.random.default_rng(seed)
        if state_type == "haar_product":
            psi0 = haar_product_state(model.L, chi, d=model.d, dtype=dtype,
                                      rng=rng)
        else:
            psi0 = create_initial_state(model.L, state_type, chi=chi,
                                        d=model.d, dtype=dtype, rng=rng)
    bond_H = model.bond_terms(dtype=dtype)

    psi = psi0
    energy_trace: list[np.ndarray] = []
    leg_energies: list[float] = []
    converged: list[bool] = []
    n_steps = 0
    t0 = time.time()
    last_tr = None
    for dt in dts:
        gates_half = model.trotter_gates(dt / 2, dtype=dtype, imag=True)
        gates_full = model.trotter_gates(dt, dtype=dtype, imag=True)
        prev_E = np.inf
        leg_converged = False
        for _ in range(max_chunks_per_dt):
            psi, tr = imaginary_time_scan(psi, gates_half, gates_full,
                                          bond_H, chunk_steps, tp)
            last_tr = tr
            e = np.asarray(tr["energy"])
            energy_trace.append(e)
            n_steps += chunk_steps
            E = float(e[-1])
            if abs(E - prev_E) < e_tol * max(1.0, abs(E)):
                leg_converged = True
                break
            prev_E = E
        converged.append(leg_converged)
        leg_energies.append(float(energy_trace[-1][-1]))

    energy = float(energy_trace[-1][-1]) if energy_trace else float("nan")
    # Richardson dt->0 extrapolation of the O(dt^2) Trotter bias from the
    # last two ladder legs' fixed-point energies: E(dt) = E0 + c dt^2 =>
    # E0 = (E_fine - r^2 E_coarse) / (1 - r^2), r = dt_fine / dt_coarse.
    # Only meaningful when both legs converged to their own fixed points.
    energy_extrap = energy
    if len(leg_energies) >= 2 and all(converged[-2:]) \
            and dts[-1] != dts[-2]:
        # equal final legs carry no dt-contrast: the extrapolation would
        # divide by 1 - r^2 = 0, so fall back to the fixed-point energy
        r = dts[-1] / dts[-2]
        energy_extrap = (leg_energies[-1] - r * r * leg_energies[-2]) \
            / (1.0 - r * r)
    info = {
        "energy_trace": np.concatenate(energy_trace) if energy_trace
        else np.zeros(0),
        "leg_energies": leg_energies,
        "energy_extrapolated": energy_extrap,
        "n_steps": n_steps,
        "wall_time": time.time() - t0,
        "dts": tuple(dts),
        "converged": converged,
        "entropies": np.asarray(last_tr["entropies"][-1]) if last_tr
        else None,
    }
    return psi, energy, info
