"""Open-system evolution: stochastic dephasing and Lindblad dynamics.

Rebuilds the reference's pyc-only module src/dynamics/open_system.py
(recovered from bytecode, SURVEY.md component 14):

  * ``OpenSystemEvolution``: pure-state approximation -- each Floquet period
    applies the model's floquet_step and then small random Z rotations per
    site with angle ~ Normal(0, std sqrt(gamma dt)) (stochastic unwinding of
    the dephasing channel: E[e^{2ia}] = e^{-2 gamma dt}).  TPU-first upgrades: angles come from
    ``jax.random`` folded per period inside the scan, and a whole
    TRAJECTORY ENSEMBLE can be vmapped and averaged (the reference runs a
    single trajectory).
  * ``LindbladEvolution``: genuine master equation
        drho/dt = -i[H, rho] + gamma sum_j (Z_j rho Z_j - rho)
    solved by vectorizing rho as a local-dimension-4 "superket" MPS and
    Trotterizing the Lindbladian: two-site superoperator gates
    exp(dt(-i(H_b x I - I x H_b^T))) via the same batched bond-update
    kernel (the MPS core is local-dimension generic), plus the analytic
    DIAGONAL one-site dephasing semigroup exp(dt gamma (Z x Z - I)).

BASELINE config covered: ``time_crystal_with_dephasing`` (open-system
Floquet evolution with dephasing, L=12).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import gates as G
from ..core.mps import (MPS, apply_one_site_gates, bond_dimensions,
                        expectation_one_site, product_state)
from ..core.truncate import TruncParams, apply_bond_gates
from ..models.kicked_ising import floquet_period
from ..ops import cpx
from ..ops.cpx import C


# ---------------------------------------------------------------------------
# Stochastic pure-state dephasing (OpenSystemEvolution)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_periods", "tp"))
def _evolve_stochastic_scan(psi0: MPS, gates, key, gamma_dt: float,
                            n_periods: int, tp: TruncParams,
                            ref_state: MPS | None = None):
    sz_op = G.pauli_c("z", psi0.dtype)
    sx_op = G.pauli_c("x", psi0.dtype)
    L = psi0.L

    def period_fn(carry, k):
        psi, key = carry
        psi, err = floquet_period(psi, gates, tp)
        key, sub = jax.random.split(key)
        # random Z rotation per site: gate diag(e^{-i a}, e^{+i a}) with
        # a ~ N(0, sqrt(gamma dt)): the channel average reproduces the
        # dephasing Lindbladian's coherence decay E[e^{2ia}] = e^{-2 gamma dt}
        angles = jax.random.normal(sub, (L,), psi.dtype) * \
            jnp.sqrt(jnp.asarray(gamma_dt, psi.dtype))
        ph = cpx.expi(-angles)
        zero = jnp.zeros_like(angles)
        g = C(jnp.stack([jnp.stack([ph.re, zero], -1),
                         jnp.stack([zero, ph.conj().re], -1)], -2),
              jnp.stack([jnp.stack([ph.im, zero], -1),
                         jnp.stack([zero, ph.conj().im], -1)], -2))
        psi = apply_one_site_gates(psi, g)
        sz = expectation_one_site(psi, sz_op).re
        sx = expectation_one_site(psi, sx_op).re
        out = dict(sz_sites=sz, sx_sites=sx,
                   max_chi=jnp.max(bond_dimensions(psi)[1:-1], initial=1),
                   trunc_err=err)
        if ref_state is not None:
            from ..core.observables import calculate_loschmidt_echo
            out["loschmidt_echo"] = calculate_loschmidt_echo(ref_state, psi)
        return (psi, key), out

    (psi_f, key_f), tr = jax.lax.scan(period_fn, (psi0, key),
                                      jnp.arange(n_periods))
    # key_f is returned so callers can ADVANCE their key past every subkey
    # the scan consumed: advancing by a single split while the scan drew
    # n_periods subkeys would replay n_periods-1 of them on the next call
    # (correlated 'independent' trajectories, biased channel averages)
    return psi_f, key_f, tr


def _add_derived_traces(traces: Dict, L: int) -> None:
    """Derive magnetization/staggered from sz_sites in place (shared by
    the single-trajectory and ensemble paths; one convention home)."""
    from ..core.observables import add_derived_magnetization

    add_derived_magnetization(traces, L)


class OpenSystemEvolution:
    """Stochastic pure-state dephasing around the Floquet drive.

    API parity with the reference's recovered class (model, gamma, max_chi);
    ``evolve_floquet_period`` applies one drive period + dephasing kicks.
    """

    def __init__(self, model, gamma: float, max_chi: int = 64,
                 trunc_params: dict | TruncParams | None = None, seed: int = 0):
        self.model = model
        self.gamma = float(gamma)
        self.max_chi = int(max_chi)
        if isinstance(trunc_params, TruncParams):
            self.trunc_params = trunc_params
        else:
            d = dict(trunc_params or {})
            d.setdefault("chi_max", max_chi)
            self.trunc_params = TruncParams.from_dict(d)
        self._key = jax.random.PRNGKey(seed)

    def _dt(self) -> float:
        return 2.0 * self.model.tau  # one Floquet period

    def evolve_floquet_period(self, psi: MPS) -> MPS:
        """One drive period followed by the dephasing approximation."""
        psi_f, self._key, _ = _evolve_stochastic_scan(
            psi, self.model.gates, self._key, self.gamma * self._dt(), 1,
            self.trunc_params)
        return psi_f

    def evolve(self, psi0: MPS, n_periods: int) -> Tuple[Dict, List[float], Dict]:
        """Single-trajectory evolution returning (traces, times, info).

        Traces carry the same observable surface as CustomFloquet
        (sz_sites / sx_sites / derived magnetizations / loschmidt_echo
        vs psi0, all in-scan)."""
        start = time.time()
        psi_f, self._key, tr = _evolve_stochastic_scan(
            psi0, self.model.gates, self._key, self.gamma * self._dt(),
            n_periods, self.trunc_params, ref_state=psi0)
        jax.block_until_ready(tr["sz_sites"])
        traces = {k: np.asarray(v) for k, v in tr.items()}
        _add_derived_traces(traces, psi0.L)
        times = [(p + 1) * self._dt() for p in range(n_periods)]
        info = {"wall_time": time.time() - start, "n_periods": n_periods,
                "gamma": self.gamma}
        return traces, times, info

    def evolve_ensemble(self, psi0: MPS, n_periods: int,
                        n_trajectories: int, mesh=None,
                        axis_name: str = "batch"
                        ) -> Tuple[Dict, List[float], Dict]:
        """vmapped trajectory ensemble: the channel average (upgrade over
        the reference's single trajectory).  Returns mean traces.

        ``mesh``: shard the trajectory axis over a device mesh -- the
        third embarrassingly-parallel axis after disorder realizations and
        phase-grid points (parallel/sweep.py); multi-process (DCN) meshes
        from parallel/multihost.py work too (the key split is
        deterministic, so every process constructs identical trajectory
        keys; traces are allgathered).  Trajectory statistics are
        UNBIASED under mesh padding: padded rows are sliced off before
        any mean/std."""
        keys = jax.random.split(self._key, n_trajectories + 1)
        self._key = keys[0]
        start = time.time()
        fn = jax.vmap(lambda k: _evolve_stochastic_scan(
            psi0, self.model.gates, k, self.gamma * self._dt(), n_periods,
            self.trunc_params, ref_state=psi0)[2])
        traj_keys = keys[1:]
        if mesh is not None:
            from ..parallel.sweep import _mesh_place

            pad_t = (-n_trajectories) % mesh.devices.size
            if pad_t:       # dup keys are computed then DISCARDED below
                traj_keys = jnp.concatenate(
                    [traj_keys, jnp.tile(traj_keys[:1], (pad_t, 1))])
            traj_keys = _mesh_place(mesh, axis_name)(traj_keys)
        tr = fn(traj_keys)
        if mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            tr = multihost_utils.process_allgather(tr, tiled=True)
        # np.asarray forces the device->host fetch (and thereby syncs)
        tr = {k: np.asarray(v)[:n_trajectories] for k, v in tr.items()}
        sz = tr["sz_sites"]                      # [T, n, L]
        sx = tr["sx_sites"]
        traces = {
            "sz_sites": sz.mean(axis=0),
            "sz_sites_std": sz.std(axis=0),
            "sx_sites": sx.mean(axis=0),
            "sx_sites_std": sx.std(axis=0),
            # channel-averaged return fidelity E|<psi0|psi(t)>|^2
            "loschmidt_echo": tr["loschmidt_echo"].mean(axis=0),
            "max_chi": np.asarray(tr["max_chi"]).max(axis=0),
            # full per-trajectory distributions (round-1 review: do not
            # max-reduce away the ensemble statistics)
            "per_trajectory": {
                "max_chi": np.asarray(tr["max_chi"]),        # [T, n]
                "trunc_err": np.asarray(tr["trunc_err"]),    # [T, n]
            },
        }
        _add_derived_traces(traces, psi0.L)
        times = [(p + 1) * self._dt() for p in range(n_periods)]
        info = {"wall_time": time.time() - start, "n_periods": n_periods,
                "n_trajectories": n_trajectories, "gamma": self.gamma}
        return traces, times, info

    # reference parity stubs (the pyc versions pass the state through)
    def psi_to_rho(self, psi: MPS) -> MPS:
        return psi

    def rho_to_psi_approximate(self, rho: MPS) -> MPS:
        return rho


# ---------------------------------------------------------------------------
# Vectorized density-matrix Lindblad evolution
# ---------------------------------------------------------------------------

def density_mps_from_product(basis_indices, chi: int, dtype=jnp.float32) -> MPS:
    """rho = |b><b| for a product state, as a local-dim-4 superket MPS.

    Vectorization convention per site: vec(rho)_[p*2+q] = rho_{p,q} with p
    the ket and q the bra index.
    """
    idx = np.asarray(basis_indices)
    super_idx = idx * 2 + idx  # |b><b| -> diagonal entries
    return product_state(jnp.asarray(super_idx), chi=chi, d=4, dtype=dtype)


def vec_identity_mps(L: int, chi: int, dtype=jnp.float32) -> MPS:
    """vec(I) as a superket MPS: sum of |00> and |11> per site (norm 2/site).
    Used to take traces: Tr(rho) = <vec(I)|vec(rho)> (unnormalized MPS)."""
    B_re = jnp.zeros((L, chi, 4, chi), dtype)
    B_re = B_re.at[:, 0, 0, 0].set(1.0).at[:, 0, 3, 0].set(1.0)
    lam = jnp.zeros((L + 1, chi), dtype).at[:, 0].set(1.0)
    return MPS(B=C(B_re, jnp.zeros_like(B_re)), lam=lam)


def trace_rho(rho: MPS) -> C:
    """Tr(rho) via transfer contraction with vec(I)."""
    from ..core.mps import overlap
    ident = vec_identity_mps(rho.L, rho.chi, rho.dtype)
    return overlap(ident, rho)


def expectation_rho_one_site(rho: MPS, op: np.ndarray) -> np.ndarray:
    """Tr(rho O_i) for all sites: replace site i's trace-vector by vec(O^T).

    O(L^2 chi^3) host loop -- fine for analysis trace lengths."""
    from ..core.mps import overlap
    L = rho.L
    vals = np.zeros(L, dtype=complex)
    # overlap() conjugates the probe: <vec(X)|vec(rho)> = Tr(X^dag rho),
    # so the probe must be vec(O^dag) to return Tr(O rho).  (op.T alone
    # gave Tr(conj(O) rho) -- wrong sign for sigma_y-class operators.)
    opv = np.asarray(op).conj().T.reshape(4)
    for i in range(L):
        ident = vec_identity_mps(L, rho.chi, rho.dtype)
        B_re = ident.B.re.at[i, 0, :, 0].set(jnp.asarray(opv.real, rho.dtype))
        B_im = ident.B.im.at[i, 0, :, 0].set(jnp.asarray(opv.imag, rho.dtype))
        probe = MPS(B=C(B_re, B_im), lam=ident.lam)
        vals[i] = complex(*map(float, overlap(probe, rho)))
    return vals


class LindbladEvolution:
    """Trotterized Lindblad master equation on a vectorized density MPS.

    drho/dt = -i[H, rho] + gamma sum_j (Z_j rho Z_j - rho)
    (reference pyc docstring: 'Equation (2) of the paper').

    ``hamiltonian``: a dynamics.tebd.NearestNeighborModel (bond terms H_b).
    """

    def __init__(self, hamiltonian, gamma: float, max_chi: int = 64,
                 dtype=jnp.float32):
        self.H = hamiltonian
        self.gamma = float(gamma)
        self.max_chi = int(max_chi)
        self.dtype = dtype

    def dephasing_superoperator(self, site: int) -> np.ndarray:
        """Single-site dephasing generator gamma (Z x Z - I), 4x4 diagonal
        (reference method name preserved)."""
        Z = np.asarray(G.SIGMA_Z)
        return self.gamma * (np.kron(Z, Z) - np.eye(4))

    def _bond_supergates(self, dt: float) -> C:
        """exp(dt * (-i)(H_b x I - I x H_b^T)) per bond: 16x16 dense."""
        import scipy.linalg
        eye4 = np.eye(4)
        gates = []
        for Hb in self.H.bond_H:
            Lb = -1j * (np.kron(Hb, eye4) - np.kron(eye4, Hb.T))
            # reorder from (ket1 ket2 bra1 bra2) to per-site superkets
            # (ket1 bra1)(ket2 bra2): permutation of the 16-dim index
            P = _pair_permutation()
            Lb = P @ Lb @ P.T
            gates.append(scipy.linalg.expm(dt * Lb))
        g = np.stack(gates).reshape(-1, 4, 4, 4, 4)
        return G.gate_from_numpy(g, dtype=self.dtype)

    def _dephasing_gates(self, dt: float) -> C:
        """Analytic diagonal semigroup exp(dt gamma (Z x Z - I)) per site."""
        d = np.exp(dt * np.diag(self.dephasing_superoperator(0)))
        g = np.diag(d).astype(complex)
        return G.gate_from_numpy(g, dtype=self.dtype)

    def _single_step(self, rho: MPS, gates_half: C, gates_full: C,
                     deph_half: C, tp: TruncParams) -> MPS:
        """One Strang step of the full Lindbladian: the DISSIPATOR is split
        symmetrically around the (itself Strang-split) Hamiltonian part, so
        the whole step is O(dt^2) even for bond terms that do not commute
        with the dephasing (dt-convergence verified in
        tests/test_open_system.py).  The dephasing semigroup is diagonal and
        SVD-free, so the extra half-application costs nothing measurable.

        Gauge caveat: the dephasing gates are NON-unitary, so after them
        the B tensors are no longer exactly right-isometric while lam is
        untouched; the following bond updates truncate in this slightly
        degraded gauge.  The deviation is O(gamma dt) per step --
        negligible at the shipped gamma*dt ~ 1e-3 -- but for strong
        dissipation with tight chi the kept subspace can drift from the
        optimal Schmidt subspace beyond the reported disc."""
        rho = apply_one_site_gates(rho, deph_half)
        rho, _ = apply_bond_gates(rho, gates_half, start=0, tp=tp)
        rho, _ = apply_bond_gates(rho, gates_full, start=1, tp=tp)
        rho, _ = apply_bond_gates(rho, gates_half, start=0, tp=tp)
        rho = apply_one_site_gates(rho, deph_half)
        return rho

    def evolve(self, rho_initial: MPS, total_time: float, dt: float,
               observe_every: int = 1):
        """Evolve vec(rho); returns (rhos, times, info).

        Truncation uses renormalize=False -- the superket norm is NOT
        conserved by the Lindbladian (purity decays); only Tr(rho) is,
        which ``trace_rho`` monitors.
        """
        n_steps = int(round(total_time / dt))
        tp = TruncParams(chi_max=self.max_chi, svd_min=1e-12,
                         renormalize=False)
        gates_half = self._bond_supergates(dt / 2)
        gates_full = self._bond_supergates(dt)
        deph_half = self._dephasing_gates(dt / 2)
        rhos, times = [rho_initial], [0.0]
        rho = rho_initial
        start = time.time()
        for k in range(n_steps):
            rho = self._single_step(rho, gates_half, gates_full,
                                    deph_half, tp)
            if k % observe_every == 0:
                # host materialization: device-resident state history
                # accumulates O(n_steps) HBM (see KickedIsingModel.evolve)
                rhos.append(jax.device_get(rho))
                times.append((k + 1) * dt)
        info = {"wall_time": time.time() - start, "n_steps": n_steps,
                "final_trace": complex(*map(float, trace_rho(rho)))}
        return rhos, times, info


def _pair_permutation() -> np.ndarray:
    """Permutation matrix reshuffling (k1 k2 b1 b2) -> (k1 b1 k2 b2)."""
    P = np.zeros((16, 16))
    for k1 in range(2):
        for k2 in range(2):
            for b1 in range(2):
                for b2 in range(2):
                    src = ((k1 * 2 + k2) * 2 + b1) * 2 + b2
                    dst = ((k1 * 2 + b1) * 2 + k2) * 2 + b2
                    P[dst, src] = 1.0
    return P
