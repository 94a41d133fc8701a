"""TDVP tests: MPO contraction identities, Lanczos, and full-rank exactness.

Key validation trick: with padded chi >= 2^(L/2) the TDVP tangent space is
the full Hilbert space, so single-site TDVP must reproduce the EXACT dense
dynamics to Lanczos accuracy -- a much sharper test than qualitative decay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timecrystal_tpu.core import gates as G
from timecrystal_tpu.core.mps import (MPS, create_initial_state,
                                      expectation_one_site, norm_squared,
                                      to_statevector)
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.tdvp import (MPO, TDVPEvolution,
                                           TDVPFloquetEvolution,
                                           ising_fields_mpo,
                                           lanczos_expm_apply, spin_chain_mpo,
                                           tdvp1_step, tdvp2_step)
from timecrystal_tpu.models.kicked_ising import KickedIsingModel
from timecrystal_tpu.ops import cpx

DTYPE = jnp.float64

from tests.exact_reference import _kron_at  # noqa: E402


def _dense_from_mpo(mpo: MPO) -> np.ndarray:
    """Contract an MPO to its dense 2^L x 2^L matrix (test sizes only)."""
    W = cpx.to_numpy(mpo.W)  # [L, Dw, Dw, d, d]
    L, Dw = W.shape[0], W.shape[1]
    # chain contraction over the MPO bond
    M = W[0][Dw - 1]  # [Dw, d, d] row selected at left edge
    acc = M  # [w, d, d]
    dim = 2
    for i in range(1, L):
        nxt = np.einsum("wab,wvcd->vacbd", acc, W[i])
        dim *= 2
        acc = nxt.reshape(W.shape[1], dim, dim)
    return acc[0]  # right edge selects column 0


class TestMPO:
    def test_spin_chain_mpo_dense_matches_bonds(self):
        """MPO contraction == sum of dense bond Hamiltonians."""
        from timecrystal_tpu.dynamics.tebd import spin_chain_model
        L = 5
        mpo = spin_chain_mpo(L, Jz=1.3, hx=0.4, hz=0.2, dtype=DTYPE)
        H_mpo = _dense_from_mpo(mpo)
        nn = spin_chain_model(L, Jz=1.3, hx=0.4, hz=0.2)
        H_ref = np.zeros((2**L, 2**L), dtype=complex)
        for b in range(L - 1):
            H_ref += _kron_at(nn.bond_H[b].reshape(4, 4), [b, b + 1], L)
        np.testing.assert_allclose(H_mpo, H_ref, atol=1e-12)

    def test_ising_fields_mpo(self):
        L = 4
        hf = np.array([0.1, -0.2, 0.3, 0.05])
        mpo = ising_fields_mpo(L, 1.0, hf, dtype=DTYPE)
        H = _dense_from_mpo(mpo)
        Z = np.asarray(G.SIGMA_Z)
        H_ref = sum(_kron_at(np.kron(Z, Z), [b, b + 1], L) for b in range(L - 1))
        H_ref = H_ref + sum(hf[i] * _kron_at(Z, [i], L) for i in range(L))
        np.testing.assert_allclose(H, H_ref, atol=1e-12)


class TestLanczos:
    def test_expm_apply_matches_dense(self):
        """Lanczos exp(-i dt H) v vs dense expm on a random Hermitian."""
        import scipy.linalg
        rng = np.random.default_rng(3)
        n = 24
        Hn = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
        Hn = (Hn + Hn.conj().T) / 2
        v = rng.normal(size=n) + 1j * rng.normal(size=n)
        Hc = cpx.from_numpy(Hn, DTYPE)
        vc = cpx.from_numpy(v.reshape(n, 1, 1), DTYPE)
        mv = lambda x: cpx.einsum("ij,jab->iab", Hc, x)
        for dt in (0.05, 0.3):
            out = lanczos_expm_apply(mv, vc, dt, m=20, sign=-1.0)
            ref = scipy.linalg.expm(-1j * dt * Hn) @ v
            got = cpx.to_numpy(out).reshape(n)
            assert np.max(np.abs(got - ref)) < 1e-8, dt


def _entangled_state(L: int, chi: int):
    """Full-occupied-rank MPS: a few entangling Floquet periods from Neel.

    1TDVP preserves the OCCUPIED bond rank (as TeNPy's does); exactness at
    'full rank' requires the initial state to already occupy 2^min(i, L-i)
    Schmidt values per bond."""
    m = KickedIsingModel(L, 1.0, 0.4, 1.1, disorder_seed=9, chi=chi,
                         theta=0.7 * np.pi, dtype=DTYPE)
    psi = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
    for _ in range(4):
        psi = m.floquet_step(psi, TruncParams(svd_min=1e-14))
    return psi


class TestTDVP1:
    def test_full_rank_matches_exact(self):
        """With every bond at full occupied rank the tangent space is the
        whole Hilbert space and the splitting telescopes exactly."""
        import scipy.linalg
        L, chi = 6, 8
        mpo = spin_chain_mpo(L, Jz=1.0, hx=0.7, hz=0.3, dtype=DTYPE)
        H = _dense_from_mpo(mpo)
        psi = _entangled_state(L, chi)
        vec = to_statevector(psi)
        dt, n_steps = 0.1, 8
        for _ in range(n_steps):
            psi = tdvp1_step(psi, mpo, dt, m=12)
        U = scipy.linalg.expm(-1j * H * dt * n_steps)
        vec_T = U @ vec
        sz_ref = [np.real(np.vdot(vec_T, _kron_at(np.asarray(G.SIGMA_Z), [i], L) @ vec_T))
                  for i in range(L)]
        sz = np.asarray(expectation_one_site(psi, G.pauli_c("z", DTYPE)).re)
        np.testing.assert_allclose(sz, sz_ref, atol=1e-6)
        assert abs(float(norm_squared(psi)) - 1.0) < 1e-9
        # full-state fidelity (global phase free)
        ov = np.vdot(vec_T, to_statevector(psi))
        assert abs(abs(ov) - 1.0) < 1e-7

    def test_rank_is_preserved_from_product_state(self):
        """Documented 1TDVP property: occupied rank cannot grow (use
        two_site for rank growth) -- matches TeNPy's SingleSiteTDVPEngine."""
        from timecrystal_tpu.core.mps import bond_dimensions
        L, chi = 6, 8
        mpo = spin_chain_mpo(L, Jz=1.0, hx=0.7, dtype=DTYPE)
        psi = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        for _ in range(5):
            psi = tdvp1_step(psi, mpo, 0.1, m=10)
        assert int(np.max(np.asarray(bond_dimensions(psi))[1:-1])) == 1

    def test_norm_and_energy_conserved_truncated(self):
        """chi below full rank: TDVP still conserves norm and energy."""
        L, chi = 8, 4
        mpo = spin_chain_mpo(L, Jz=1.0, hx=0.5, dtype=DTYPE)
        psi = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)

        def energy(p):
            # <H> via dense for L=8 (exact expectation of the MPS state)
            H = _dense_from_mpo(mpo)
            v = to_statevector(p)
            return np.real(np.vdot(v, H @ v))

        e0 = energy(psi)
        for _ in range(10):
            psi = tdvp1_step(psi, mpo, 0.05, m=10)
        assert abs(float(norm_squared(psi)) - 1.0) < 1e-9
        assert abs(energy(psi) - e0) < 1e-6  # 1TDVP conserves energy


class TestTDVP2:
    def test_full_rank_matches_exact(self):
        import scipy.linalg
        L, chi = 6, 8
        mpo = spin_chain_mpo(L, Jz=1.0, hx=0.6, hz=0.2, dtype=DTYPE)
        H = _dense_from_mpo(mpo)
        psi = _entangled_state(L, chi)
        vec = to_statevector(psi)
        tp = TruncParams(chi_max=0, svd_min=1e-14)
        dt, n_steps = 0.05, 6
        for _ in range(n_steps):
            psi, err = tdvp2_step(psi, mpo, dt, 12, tp)
        vec_T = scipy.linalg.expm(-1j * H * dt * n_steps) @ vec
        ov = np.vdot(vec_T, to_statevector(psi))
        assert abs(abs(ov) - 1.0) < 1e-6  # 2TDVP has O(dt^3)/step splitting error
        assert abs(float(norm_squared(psi)) - 1.0) < 1e-9

    def test_bond_growth_from_product_state(self):
        """2TDVP grows chi (1TDVP cannot) -- the reason it exists."""
        from timecrystal_tpu.core.mps import bond_dimensions
        L, chi = 8, 16
        mpo = spin_chain_mpo(L, Jz=1.0, hx=0.8, dtype=DTYPE)
        psi = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        tp = TruncParams(chi_max=16, svd_min=1e-12)
        for _ in range(5):
            psi, _ = tdvp2_step(psi, mpo, 0.1, 10, tp)
        assert int(np.max(np.asarray(bond_dimensions(psi))[1:-1])) > 1


class TestAPIClasses:
    def test_evolve_contract(self):
        eng = TDVPEvolution.from_spin_chain(6, Jz=1.0, hx=0.5, dtype=DTYPE,
                                            dt=0.1, max_chi=8,
                                            tdvp_type="single_site")
        psi0 = create_initial_state(6, "neel", chi=8, dtype=DTYPE)
        states, times, info = eng.evolve(psi0, total_time=0.5)
        assert len(states) == 6
        for key in ("wall_time", "bond_dimensions", "entanglement_entropies",
                    "truncation_errors", "algorithm", "max_chi_reached"):
            assert key in info
        assert info["algorithm"] == "TDVP (single_site)"

    def test_bad_tdvp_type(self):
        with pytest.raises(ValueError):
            TDVPEvolution(None, tdvp_type="three_site")

    def test_floquet_via_tdvp_matches_gates(self):
        """TDVP Floquet period == gate-based floquet_step at full rank.

        The Ising half-step Hamiltonian is diagonal, so with chi at full
        rank and fine dt both paths realize the same unitary; note the
        double-counted interior fields (quirk 2) make the gate path's
        effective Hamiltonian sum_b (J ZZ + h_i Z + h_j Z) with interior
        fields doubled -- the MPO below replicates that by doubling
        interior fields."""
        L, chi = 6, 8
        m = KickedIsingModel(L, 1.0, 0.3, 0.8, disorder_seed=4, chi=chi,
                             dtype=DTYPE)
        # effective field profile of the gate path: interior sites doubled
        eff = m.h_fields.copy()
        eff[1:-1] *= 2.0
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        psi_gate = m.floquet_step(psi0, TruncParams(svd_min=1e-14))

        # TDVPFloquetEvolution now builds the effective-field MPO itself
        tfe = TDVPFloquetEvolution(m, dt=0.05, max_chi=chi,
                                   tdvp_type="single_site")
        np.testing.assert_allclose(
            np.asarray(tfe.mpo.W.re[1]),
            np.asarray(ising_fields_mpo(L, m.J, eff, dtype=DTYPE).W.re[1]),
            atol=1e-14)
        psi_tdvp = tfe.evolve_floquet_period(psi0)

        from timecrystal_tpu.core.mps import overlap
        ov = overlap(psi_gate, psi_tdvp)
        assert abs(float(cpx.abs2(ov)) - 1.0) < 1e-8

    def test_benchmark_vs_tebd_contract(self):
        m = KickedIsingModel(6, 1.0, 0.2, 0.6, disorder_seed=2, chi=8,
                             dtype=DTYPE)
        tfe = TDVPFloquetEvolution(m, dt=0.15, max_chi=8,
                                   tdvp_type="single_site")
        out = tfe.benchmark_vs_tebd([4, 6], n_periods=1)
        for key in ("tebd_times", "tdvp_times", "tebd_chi_max",
                    "tdvp_chi_max", "speedup", "error"):
            assert set(out[key]) == {4, 6}
