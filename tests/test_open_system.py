"""Open-system tests: stochastic dephasing channel + Lindblad superket MPS.

Validates the physics, not just the plumbing: the trajectory ensemble and
the Lindblad solver must both reproduce analytic dephasing decay, and the
Lindblad solver must conserve the trace.
"""

import jax
import jax.numpy as jnp
import numpy as np

from timecrystal_tpu.core.mps import MPS, create_initial_state, product_state
from timecrystal_tpu.core import gates as G
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.open_system import (LindbladEvolution,
                                                  OpenSystemEvolution,
                                                  density_mps_from_product,
                                                  expectation_rho_one_site,
                                                  trace_rho)
from timecrystal_tpu.dynamics.tebd import NearestNeighborModel, spin_chain_model
from timecrystal_tpu.models.kicked_ising import KickedIsingModel
from timecrystal_tpu.ops import cpx

DTYPE = jnp.float64


class TestStochasticDephasing:
    def test_single_trajectory_runs_and_is_normalized(self):
        m = KickedIsingModel(8, 1.0, 0.3, 1.0, disorder_seed=42, dtype=DTYPE)
        psi0 = create_initial_state(8, "neel", chi=16, dtype=DTYPE)
        ose = OpenSystemEvolution(m, gamma=0.01, max_chi=16)
        traces, times, info = ose.evolve(psi0, 10)
        assert traces["sz_sites"].shape == (10, 8)
        assert np.all(np.abs(traces["sz_sites"]) <= 1 + 1e-6)
        assert len(times) == 10

    def test_loschmidt_echo_traced_and_protected(self):
        """Traces carry loschmidt_echo vs psi0; at an EXACT pi pulse with a
        z-basis start, pure-Z dephasing never touches the return fidelity:
        LE alternates exactly 0 (odd periods: anti-Neel) / 1 (even
        periods) at any gamma -- the stored-bit protection seen through
        the fidelity observable."""
        m = KickedIsingModel(6, 1.0, 0.3, 1.0, disorder_seed=3, dtype=DTYPE)
        psi0 = create_initial_state(6, "neel", chi=16, dtype=DTYPE)
        traces, _, _ = OpenSystemEvolution(m, gamma=0.2,
                                           max_chi=16).evolve(psi0, 8)
        le = traces["loschmidt_echo"]
        assert le.shape == (8,)
        np.testing.assert_allclose(le[0::2], 0.0, atol=1e-10)  # periods 1,3..
        np.testing.assert_allclose(le[1::2], 1.0, atol=1e-10)  # periods 2,4..
        # ensemble path carries the channel-averaged fidelity too
        tr_e, _, _ = OpenSystemEvolution(m, gamma=0.2, max_chi=16) \
            .evolve_ensemble(psi0, 4, n_trajectories=3)
        np.testing.assert_allclose(tr_e["loschmidt_echo"][1::2], 1.0,
                                   atol=1e-10)

    def test_evolve_floquet_period_single(self):
        from timecrystal_tpu.core.mps import norm_squared
        m = KickedIsingModel(6, 1.0, 0.2, 1.0, disorder_seed=1, dtype=DTYPE)
        psi0 = create_initial_state(6, "neel", chi=16, dtype=DTYPE)
        psi1 = OpenSystemEvolution(m, gamma=0.01).evolve_floquet_period(psi0)
        assert abs(float(norm_squared(psi1)) - 1.0) < 1e-8  # unitary channel

    def test_ensemble_average_reproduces_dephasing_decay(self):
        """Free dephasing (no drive: J=0, h=0, theta -> 2pi equivalent? --
        instead use trivial drive and measure <sigma_x> decay of |+> state):
        E[<sx>](t) = e^{-2 gamma t} <sx>(0)."""
        L = 4
        gamma, tau = 0.05, 0.5
        # trivial model: J=0, h=0, theta=0 kick -> identity Floquet step
        m = KickedIsingModel(L, 0.0, 0.0, tau, h_fields=np.zeros(L),
                             theta=0.0, dtype=DTYPE)
        # |+>^L state: rotate all_up by exp(-i pi/4 sy)... build directly
        plus = np.full((L,), 1 / np.sqrt(2))
        psi0 = product_state(np.zeros(L, np.int32), chi=8, dtype=DTYPE)
        B_re = psi0.B.re.at[:, 0, 1, 0].set(jnp.asarray(plus, DTYPE))
        B_re = B_re.at[:, 0, 0, 0].set(jnp.asarray(plus, DTYPE))
        psi0 = MPS(B=cpx.C(B_re, psi0.B.im), lam=psi0.lam)

        n_periods, n_traj = 8, 600
        ose = OpenSystemEvolution(m, gamma=gamma, max_chi=8, seed=3)
        # measure sx via rotating... simpler: use expectation directly
        import timecrystal_tpu.core.observables as obs
        from timecrystal_tpu.dynamics.open_system import _evolve_stochastic_scan
        keys = jax.random.split(jax.random.PRNGKey(7), n_traj)
        dt = 2 * tau
        sx_op = G.pauli_c("x", DTYPE)

        # evolve each trajectory and track <sx> at final time
        def sx_final(k):
            psi_f, _, _ = _evolve_stochastic_scan(psi0, m.gates, k, gamma * dt,
                                                  n_periods,
                                                  TruncParams(svd_min=1e-14))
            from timecrystal_tpu.core.mps import expectation_one_site
            return expectation_one_site(psi_f, sx_op).re

        sx = np.asarray(jax.vmap(sx_final)(keys))  # [T, L]
        mean_sx = sx.mean()
        t_final = n_periods * dt
        expected = np.exp(-2 * gamma * t_final)
        # Monte-Carlo tolerance ~ 1/sqrt(T)
        assert abs(mean_sx - expected) < 0.05, (mean_sx, expected)


class TestLindblad:
    def _rho_plus(self, L, chi=8):
        """rho for |+>^L as a superket MPS (all entries 1/2 per site)."""
        rho = density_mps_from_product(np.zeros(L, np.int32), chi, DTYPE)
        B_re = rho.B.re.at[:, 0, :, 0].set(0.5 * jnp.ones((L, 4), DTYPE))
        return MPS(B=cpx.C(B_re, rho.B.im), lam=rho.lam)

    def test_expectation_complex_operator(self):
        """Tr(O rho) for COMPLEX O: rho = (I + sigma_y)/2 must give
        <sigma_y> = +1 (the old op.T probe computed Tr(conj(O) rho) and
        returned -1)."""
        L = 2
        rho = density_mps_from_product(np.zeros(L, np.int32), 8, DTYPE)
        # per-site rho = (I + sigma_y)/2 = [[0.5, -0.5j], [0.5j, 0.5]],
        # vec layout row-major: (0.5, -0.5j, 0.5j, 0.5)
        B_re = rho.B.re.at[:, 0, :, 0].set(
            jnp.asarray([0.5, 0.0, 0.0, 0.5], DTYPE))
        B_im = rho.B.im.at[:, 0, :, 0].set(
            jnp.asarray([0.0, -0.5, 0.5, 0.0], DTYPE))
        rho = MPS(B=cpx.C(B_re, B_im), lam=rho.lam)
        sy = expectation_rho_one_site(rho, np.asarray(G.SIGMA_Y))
        np.testing.assert_allclose(sy.real, 1.0, atol=1e-10)
        np.testing.assert_allclose(sy.imag, 0.0, atol=1e-10)
        sx = expectation_rho_one_site(rho, np.asarray(G.SIGMA_X))
        np.testing.assert_allclose(sx.real, 0.0, atol=1e-10)

    def test_stochastic_key_advances(self):
        """Repeated evolve() calls on one instance must use fresh noise:
        the key used to advance by one split while the scan consumed
        n_periods subkeys, replaying n-1 of them on the next call."""
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.dynamics.open_system import OpenSystemEvolution
        from timecrystal_tpu.models import KickedIsingModel
        L = 4
        m = KickedIsingModel(L, 1.0, 0.0, 1.0, disorder_seed=0, chi=8,
                             dtype=DTYPE, theta=0.9 * np.pi)
        ose = OpenSystemEvolution(m, gamma=0.3, max_chi=8, seed=7)
        psi0 = create_initial_state(L, "all_up", chi=8, dtype=DTYPE)
        tr1, _, _ = ose.evolve(psi0, 5)
        tr2, _, _ = ose.evolve(psi0, 5)
        # same state, same model: identical traces would mean replayed noise
        assert not np.allclose(tr1["sz_sites"], tr2["sz_sites"]), \
            "second evolve() replayed the first call's dephasing noise"

    def test_trace_preserved(self):
        L = 4
        H = spin_chain_model(L, Jz=1.0, hx=0.3)
        le = LindbladEvolution(H, gamma=0.05, max_chi=16, dtype=DTYPE)
        rho0 = self._rho_plus(L)
        assert abs(complex(*map(float, trace_rho(rho0))) - 1.0) < 1e-10
        rhos, times, info = le.evolve(rho0, total_time=1.0, dt=0.05)
        tr = complex(*map(float, trace_rho(rhos[-1])))
        assert abs(tr - 1.0) < 1e-6

    def test_pure_dephasing_coherence_decay(self):
        """H = 0: coherences decay exactly as e^{-2 gamma t}."""
        L = 3
        H = NearestNeighborModel(np.zeros((L - 1, 4, 4)))
        gamma = 0.1
        le = LindbladEvolution(H, gamma=gamma, max_chi=8, dtype=DTYPE)
        rho0 = self._rho_plus(L)
        rhos, times, info = le.evolve(rho0, total_time=2.0, dt=0.1)
        sx = expectation_rho_one_site(rhos[-1], np.asarray(G.SIGMA_X))
        expected = np.exp(-2 * gamma * times[-1])
        np.testing.assert_allclose(sx.real, expected, atol=1e-8)
        sz = expectation_rho_one_site(rhos[-1], np.asarray(G.SIGMA_Z))
        np.testing.assert_allclose(sz.real, 0.0, atol=1e-10)  # populations fixed

    def test_lindblad_vs_exact_small_system(self):
        """Full Lindblad (H != 0) vs dense superoperator integration, L=3."""
        import scipy.linalg
        L, gamma, dt, T = 3, 0.08, 0.02, 0.6
        H = spin_chain_model(L, Jz=1.0, hx=0.4, hz=0.2)
        le = LindbladEvolution(H, gamma=gamma, max_chi=16, dtype=DTYPE)
        rho0 = self._rho_plus(L)
        rhos, times, info = le.evolve(rho0, total_time=T, dt=dt)

        # dense reference
        from tests.exact_reference import _kron_at
        dim = 2**L
        Hd = np.zeros((dim, dim), dtype=complex)
        for b in range(L - 1):
            Hd += _kron_at(H.bond_H[b].reshape(4, 4), [b, b + 1], L)
        Z = np.asarray(G.SIGMA_Z)
        Ls = [_kron_at(Z, [i], L) for i in range(L)]
        eyeD = np.eye(dim)
        # Liouvillian: -i(H x I - I x H^T) + gamma sum (Z x Z^* - I)
        Lsup = -1j * (np.kron(Hd, eyeD) - np.kron(eyeD, Hd.T))
        for Lz in Ls:
            Lsup += gamma * (np.kron(Lz, Lz.conj()) - np.eye(dim**2))
        rho_d = np.full((dim, dim), 1.0 / dim, dtype=complex)  # |+><+|^L
        rho_T = (scipy.linalg.expm(Lsup * times[-1]) @ rho_d.reshape(-1)).reshape(dim, dim)

        sx_mps = expectation_rho_one_site(rhos[-1], np.asarray(G.SIGMA_X))
        sx_exact = [np.trace(_kron_at(np.asarray(G.SIGMA_X), [i], L) @ rho_T).real
                    for i in range(L)]
        np.testing.assert_allclose(sx_mps.real, sx_exact, atol=2e-3)  # Trotter dt^2


class TestStrangConvergence:
    """The dissipator is Strang-split around the Hamiltonian part: the
    whole step must converge as O(dt^2) against the dense Liouvillian
    (round-1 review: the dissipator was previously tacked on first-order)."""

    def test_dt2_convergence_vs_dense_liouvillian(self):
        import scipy.linalg

        from tests.exact_reference import _kron_at

        L, gamma, T = 3, 0.08, 0.6
        H = spin_chain_model(L, Jz=1.0, hx=0.4, hz=0.2)

        def rho_plus():
            # |+>^L start exercises both coherences and populations
            rho = density_mps_from_product(np.zeros(L, np.int32), 16, DTYPE)
            B_re = rho.B.re.at[:, 0, :, 0].set(0.5 * jnp.ones((L, 4), DTYPE))
            return MPS(B=cpx.C(B_re, rho.B.im), lam=rho.lam)

        def run(dt):
            le = LindbladEvolution(H, gamma=gamma, max_chi=16, dtype=DTYPE)
            rhos, times, info = le.evolve(rho_plus(), total_time=T, dt=dt)
            return expectation_rho_one_site(rhos[-1],
                                            np.asarray(G.SIGMA_X)).real

        dim = 2**L
        Hd = np.zeros((dim, dim), dtype=complex)
        for b in range(L - 1):
            Hd += _kron_at(H.bond_H[b].reshape(4, 4), [b, b + 1], L)
        Z = np.asarray(G.SIGMA_Z)
        eyeD = np.eye(dim)
        Lsup = -1j * (np.kron(Hd, eyeD) - np.kron(eyeD, Hd.T))
        for i in range(L):
            Lz = _kron_at(Z, [i], L)
            Lsup += gamma * (np.kron(Lz, Lz.conj()) - np.eye(dim**2))
        rho_d = np.full((dim, dim), 1.0 / dim, dtype=complex)
        rho_T = (scipy.linalg.expm(Lsup * T) @ rho_d.reshape(-1)).reshape(dim, dim)
        sx_exact = np.array(
            [np.trace(_kron_at(np.asarray(G.SIGMA_X), [i], L) @ rho_T).real
             for i in range(L)])

        err_dt = np.max(np.abs(run(0.1) - sx_exact))
        err_dt2 = np.max(np.abs(run(0.05) - sx_exact))
        err_dt4 = np.max(np.abs(run(0.025) - sx_exact))
        # O(dt^2): halving dt should cut the error ~4x (allow >=3x for
        # subleading terms)
        assert err_dt / err_dt2 > 3.0, (err_dt, err_dt2)
        assert err_dt2 / err_dt4 > 3.0, (err_dt2, err_dt4)


class TestEnsembleDistributions:
    def test_per_trajectory_distributions_exposed(self):
        from timecrystal_tpu.models.kicked_ising import KickedIsingModel

        L, chi, n, T = 6, 16, 4, 5
        m = KickedIsingModel(L, 1.0, 0.3, 1.0, disorder_seed=1, chi=chi,
                             theta=0.92 * np.pi, dtype=DTYPE)
        ose = OpenSystemEvolution(m, gamma=0.02, max_chi=chi, seed=3)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        traces, times, info = ose.evolve_ensemble(psi0, T, n)
        pt = traces["per_trajectory"]
        assert pt["max_chi"].shape == (n, T)
        assert pt["trunc_err"].shape == (n, T)
        assert np.all(pt["trunc_err"] >= 0)
        # trajectories genuinely differ (random kicks)
        assert np.std(np.asarray(traces["sz_sites_std"])) >= 0

    def test_ensemble_mesh_matches_unsharded(self):
        """Trajectory axis sharded over the 8-device mesh: identical
        statistics to the unsharded ensemble at the same seed, including
        a trajectory count that is NOT a mesh multiple (padding rows must
        not bias the mean/std)."""
        from timecrystal_tpu.models.kicked_ising import KickedIsingModel
        from timecrystal_tpu.parallel.sweep import default_mesh

        L, chi, n, T = 6, 16, 5, 4      # n=5 on 8 devices: padded
        m = KickedIsingModel(L, 1.0, 0.3, 1.0, disorder_seed=1, chi=chi,
                             theta=0.92 * np.pi, dtype=DTYPE)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        ref = OpenSystemEvolution(m, gamma=0.02, max_chi=chi, seed=3) \
            .evolve_ensemble(psi0, T, n)[0]
        got = OpenSystemEvolution(m, gamma=0.02, max_chi=chi, seed=3) \
            .evolve_ensemble(psi0, T, n, mesh=default_mesh())[0]
        for k in ("sz_sites", "sz_sites_std", "max_chi"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]), atol=1e-12,
                                       err_msg=k)
        np.testing.assert_allclose(got["per_trajectory"]["trunc_err"],
                                   ref["per_trajectory"]["trunc_err"],
                                   atol=1e-15)
