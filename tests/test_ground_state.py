"""Imaginary-time TEBD ground-state preparation vs exact diagonalization.

The reference README advertises imaginary-time ground-state preparation
but never implements it (no imaginary dt anywhere in the reference code);
dynamics/ground_state.py supplies it.  These tests pin the result against
dense exact diagonalization of the identical bond Hamiltonians.
"""

import numpy as np
import jax.numpy as jnp

from timecrystal_tpu.core.mps import create_initial_state, haar_product_state
from timecrystal_tpu.core.observables import (bond_energies,
                                              bond_energies_exact,
                                              total_energy)
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.ground_state import (find_ground_state,
                                                   imaginary_time_scan)
from timecrystal_tpu.dynamics.tebd import spin_chain_model


def dense_hamiltonian(model) -> np.ndarray:
    """Sum of kron-embedded bond terms -- the exact oracle."""
    L, d = model.L, model.d
    H = np.zeros((d**L, d**L), dtype=complex)
    for b, Hb in enumerate(model.bond_H):
        H += np.kron(np.kron(np.eye(d**b), Hb), np.eye(d ** (L - b - 2)))
    return H


def exact_ground_energy(model) -> float:
    return float(np.linalg.eigvalsh(dense_hamiltonian(model))[0])


def test_bond_energies_product_state():
    """Classical check: Neel product state in a pure ZZ + longitudinal
    field chain has an analytic energy (S = sigma/2 convention)."""
    L = 8
    model = spin_chain_model(L, Jz=1.0, hz=0.3)
    psi = create_initial_state(L, "neel", chi=4, dtype=jnp.float64)
    bh = model.bond_terms(dtype=jnp.float64)
    eb = np.asarray(bond_energies(psi, bh))
    assert eb.shape == (L - 1,)
    # Neel: <Sz_i> = +-1/2 alternating -> every ZZ bond contributes -1/4;
    # field sum_i hz <Sz_i> = 0 for even L.
    E_exact = -(L - 1) * 0.25
    assert abs(float(np.sum(eb)) - E_exact) < 1e-12
    assert abs(float(np.asarray(total_energy(psi, bh))) - E_exact) < 1e-12
    # on a clean canonical state the exact-environment variant agrees
    eb_exact = np.asarray(bond_energies_exact(psi, bh))
    np.testing.assert_allclose(eb_exact, eb, atol=1e-12)


def test_exact_env_energy_on_entangled_canonical_state():
    """bond_energies (canonical-form shortcut) and bond_energies_exact
    agree on a properly canonical entangled state (a Haar product state
    descended a few exactly-renormalized steps stays near-canonical at
    chi=16 where no truncation occurs, dt small)."""
    L = 8
    model = spin_chain_model(L, Jx=1.0, Jy=1.0, Jz=1.0)
    bh = model.bond_terms(dtype=jnp.float64)
    psi0 = haar_product_state(L, 16, dtype=jnp.float64,
                              rng=np.random.default_rng(3))
    tp = TruncParams(chi_max=0, svd_min=1e-14)
    gh = model.trotter_gates(5e-4, dtype=jnp.float64, imag=True)
    gf = model.trotter_gates(1e-3, dtype=jnp.float64, imag=True)
    psi, _ = imaginary_time_scan(psi0, gh, gf, bh, 20, tp)
    e_canon = np.asarray(bond_energies(psi, bh))
    e_exact = np.asarray(bond_energies_exact(psi, bh))
    # canonical-form drift is O(dt): at dt=1e-3 the two must agree closely
    np.testing.assert_allclose(e_canon, e_exact, atol=5e-4)


def test_tfim_ground_state_energy():
    """Transverse-field Ising chain L=8: imaginary-time TEBD energy matches
    dense exact diagonalization (the exact-environment Rayleigh quotient
    is quadratic in the state error, so even the dt ladder's fixed points
    are nearly bias-free)."""
    L = 8
    model = spin_chain_model(L, Jz=1.0, hx=0.7)
    psi, E, info = find_ground_state(model, chi=16, dtype=jnp.float64,
                                     dts=(0.1, 0.01, 1e-3))
    E_exact = exact_ground_energy(model)
    assert abs(E - E_exact) < 1e-7, (E, E_exact)
    assert abs(info["energy_extrapolated"] - E_exact) < 1e-7
    assert all(info["converged"])
    # the search state stays normalized (renormalize=True per bond)
    lam_norms = np.asarray(jnp.sum(psi.lam[1:L] ** 2, axis=-1))
    assert np.allclose(lam_norms, 1.0, atol=1e-8)


def test_heisenberg_ground_state_energy():
    """Antiferromagnetic Heisenberg chain L=8 (chi=16 is exact here).

    This is the symmetry-trap regression: the default haar_product start
    has weight in every total-Sz sector, so the descent reaches the
    singlet ground state (a random BASIS start with Sz != 0 provably
    cannot)."""
    L = 8
    model = spin_chain_model(L, Jx=1.0, Jy=1.0, Jz=1.0)
    psi, E, info = find_ground_state(model, chi=16, dtype=jnp.float64,
                                     dts=(0.1, 0.01, 1e-3))
    E_exact = exact_ground_energy(model)
    assert abs(E - E_exact) < 1e-7, (E, E_exact)
    # entanglement of the Heisenberg GS is nontrivial
    assert float(np.max(info["entropies"])) > 0.5


def test_energy_descends_within_leg():
    """Within one fixed-dt leg the in-scan energy trace is (near-)monotone
    decreasing -- imaginary-time evolution is a descent."""
    L = 8
    model = spin_chain_model(L, Jz=1.0, hx=0.7)
    psi0 = haar_product_state(L, 16, dtype=jnp.float64,
                              rng=np.random.default_rng(0))
    tp = TruncParams(chi_max=0, svd_min=1e-14)
    gh = model.trotter_gates(0.05, dtype=jnp.float64, imag=True)
    gf = model.trotter_gates(0.1, dtype=jnp.float64, imag=True)
    _, tr = imaginary_time_scan(psi0, gh, gf,
                                model.bond_terms(dtype=jnp.float64),
                                60, tp)
    e = np.asarray(tr["energy"])
    assert float(e[-1]) < float(e[0])
    # no step may raise the energy beyond tiny Trotter/truncation noise
    assert float(np.max(np.diff(e))) < 1e-8


def test_f32_default_tolerance_converges():
    """The default (dtype=f32) search must CONVERGE per leg, not silently
    burn max_chunks_per_dt: the dtype-aware e_tol default (1e-6 in f32)
    sits above the ~1e-7-relative f32 in-scan energy jitter that a blanket
    1e-10 tolerance could never cross."""
    L = 6
    model = spin_chain_model(L, Jz=1.0, hx=0.7)
    psi, E, info = find_ground_state(model, chi=8, dts=(0.1, 0.02),
                                     max_chunks_per_dt=60)
    assert all(info["converged"]), info["converged"]
    # f32 accuracy class vs the dense oracle
    assert abs(E - exact_ground_energy(model)) < 1e-3, E
    # convergence happened well before the chunk cap on every leg
    assert info["n_steps"] < 2 * 60 * 20


def test_ground_state_from_explicit_psi0():
    """An explicit psi0 overrides the default start; the ladder still
    reaches the ground state from a Neel state when the Hamiltonian mixes
    sectors (TFIM: hx breaks Sz conservation)."""
    L = 6
    model = spin_chain_model(L, Jz=1.0, hx=0.9)
    psi0 = create_initial_state(L, "neel", chi=16, dtype=jnp.float64)
    psi, E, info = find_ground_state(model, chi=16, psi0=psi0,
                                     dtype=jnp.float64, dts=(0.1, 0.01, 1e-3))
    assert abs(E - exact_ground_energy(model)) < 1e-7


def test_equal_final_dts_skip_extrapolation():
    """A ladder whose final two legs share one dt has no dt-contrast for
    Richardson extrapolation (1 - r^2 = 0): the search must return the
    fixed-point energy rather than dividing by zero."""
    L = 4
    model = spin_chain_model(L, Jz=1.0, hx=0.7)
    psi, E, info = find_ground_state(model, chi=8, dts=(0.05, 0.05),
                                     max_chunks_per_dt=40)
    assert np.isfinite(info["energy_extrapolated"])
    assert info["energy_extrapolated"] == E
