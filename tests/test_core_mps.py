"""Unit tests: MPS primitives, gates, truncation.

Mirrors the reference's unit tier (tests/test_basic_functionality.py:52-117)
plus exact-statevector cross-checks the reference lacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from timecrystal_tpu.ops import cpx

from timecrystal_tpu.core import gates as G
from timecrystal_tpu.core import mps as M
from timecrystal_tpu.core import observables as obs
from timecrystal_tpu.core.truncate import TruncParams, apply_two_site_gate

DTYPE = jnp.float64


class TestPauli:
    def test_anticommutation(self):
        p = G.pauli_matrices()
        for a, b in [("X", "Y"), ("Y", "Z"), ("Z", "X")]:
            anti = p[a] @ p[b] + p[b] @ p[a]
            np.testing.assert_allclose(anti, np.zeros((2, 2)), atol=1e-14)

    def test_squares_to_identity(self):
        p = G.pauli_matrices()
        for k in "XYZ":
            np.testing.assert_allclose(p[k] @ p[k], np.eye(2), atol=1e-14)

    def test_pi_pulse_exact(self):
        import scipy.linalg
        expected = scipy.linalg.expm(-1j * np.pi / 2 * G.SIGMA_X)
        np.testing.assert_allclose(cpx.to_numpy(G.pi_pulse_gate(DTYPE)), expected, atol=1e-12)


class TestStates:
    @pytest.mark.parametrize("stype", ["all_up", "all_down", "neel", "random"])
    def test_norm_one(self, stype):
        psi = M.create_initial_state(8, stype, chi=8, dtype=DTYPE,
                                     rng=np.random.default_rng(0))
        assert abs(float(M.norm_squared(psi)) - 1.0) < 1e-12

    def test_neel_pattern(self):
        psi = M.create_initial_state(6, "neel", chi=4, dtype=DTYPE)
        sz = np.asarray(obs.sz_sites(psi))
        np.testing.assert_allclose(sz, [1, -1, 1, -1, 1, -1], atol=1e-12)

    def test_statevector_roundtrip(self):
        psi = M.create_initial_state(4, "neel", chi=4, dtype=DTYPE)
        vec = np.asarray(M.to_statevector(psi))
        expected = np.zeros(16)
        # |up down up down> = indices (0,1,0,1) -> 0*8+1*4+0*2+1 = 5
        expected[5] = 1.0
        np.testing.assert_allclose(np.abs(vec), expected, atol=1e-12)

    def test_unknown_state_raises(self):
        with pytest.raises(ValueError):
            M.create_initial_state(4, "bogus", chi=4)


class TestComplexScalarCoercion:
    def test_complex_scalar_operand(self):
        """C * (python complex) must do the complex product: a complex
        scalar used to be treated as real, silently landing its imaginary
        part in the .re field."""
        a = cpx.C(jnp.asarray([1.0, 2.0]), jnp.asarray([0.5, -1.0]))
        ref = (np.asarray(a.re) + 1j * np.asarray(a.im)) * (1 + 2j)
        out = a * (1 + 2j)
        assert not np.iscomplexobj(np.asarray(out.re))
        np.testing.assert_allclose(np.asarray(out.re), ref.real, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.im), ref.imag, atol=1e-12)
        out2 = a * (-1j)
        np.testing.assert_allclose(np.asarray(out2.re),
                                   np.asarray(a.im), atol=1e-12)
        out3 = (a + 2j) - 1j
        np.testing.assert_allclose(np.asarray(out3.im),
                                   np.asarray(a.im) + 1.0, atol=1e-12)
        out4 = a / (1j)
        np.testing.assert_allclose(np.asarray(out4.re),
                                   np.asarray(a.im), atol=1e-12)

    def test_reflected_operators(self):
        """Left-operand arithmetic must do complex math, not tuple
        repetition (2 * C used to return the 4-tuple (re, im, re, im))."""
        a = cpx.C(jnp.asarray([1.0, 2.0]), jnp.asarray([0.5, -1.0]))
        out = 2 * a
        assert isinstance(out, cpx.C) and out.re.shape == (2,)
        np.testing.assert_allclose(np.asarray(out.re), [2.0, 4.0], atol=0)
        out2 = (1 + 2j) * a
        ref = (1 + 2j) * (np.asarray(a.re) + 1j * np.asarray(a.im))
        np.testing.assert_allclose(np.asarray(out2.re), ref.real, atol=1e-12)
        np.testing.assert_allclose(np.asarray(out2.im), ref.imag, atol=1e-12)
        out3 = 1.0 + a
        np.testing.assert_allclose(np.asarray(out3.re), [2.0, 3.0], atol=0)
        out4 = 1.0 - a
        np.testing.assert_allclose(np.asarray(out4.re), [0.0, -1.0], atol=0)
        np.testing.assert_allclose(np.asarray(out4.im), [-0.5, 1.0], atol=0)

    def test_implicit_array_conversion_rejected(self):
        """np.asarray(C) (e.g. a jax array on the LEFT of an operator)
        must fail loudly instead of stacking (re, im) into a real axis."""
        a = cpx.C(jnp.asarray([1.0]), jnp.asarray([0.5]))
        with pytest.raises(TypeError, match="cpx.to_numpy"):
            np.asarray(a)


class TestTwoSiteGate:
    def test_identity_gate_preserves_state(self):
        psi = M.create_initial_state(6, "neel", chi=8, dtype=DTYPE)
        eye = np.eye(4, dtype=complex)
        psi2 = apply_two_site_gate(psi, eye, 2, 3, {"chi_max": 8})
        v1 = np.asarray(M.to_statevector(psi))
        v2 = np.asarray(M.to_statevector(psi2))
        # global phase free
        ov = np.vdot(v1, v2)
        assert abs(abs(ov) - 1.0) < 1e-12

    def test_nonadjacent_raises(self):
        psi = M.create_initial_state(6, "neel", chi=8, dtype=DTYPE)
        with pytest.raises(ValueError):
            apply_two_site_gate(psi, np.eye(4), 1, 3)

    def test_reversed_site_order_asymmetric_gate(self):
        """(i, j) = (2, 1) must act with the gate's FIRST site axis on
        site 2: the i>j reorder exchanges the gate's site axes (a plain
        swap used to apply CNOT with control and target exchanged)."""
        from tests.exact_reference import _kron_at, product_statevector
        L = 4
        cnot = np.zeros((4, 4), dtype=complex)
        cnot[0, 0] = cnot[1, 1] = cnot[2, 3] = cnot[3, 2] = 1.0
        # |psi> = |0 1 0 0>: control on site 1 is |1>, so CNOT(control=2?,..)
        psi = M.create_initial_state(L, "all_up", chi=8, dtype=DTYPE)
        sx = np.array([[0, 1], [1, 0]], dtype=complex)
        g1 = cpx.from_numpy(np.stack([np.eye(2), sx, np.eye(2), np.eye(2)]),
                            dtype=DTYPE)
        psi = M.apply_one_site_gates(psi, g1)
        vec = product_statevector([0, 1, 0, 0])
        # gate sites (2, 1): control = site 2 (|0>) -> state unchanged by
        # CNOT(control=2, target=1); the buggy version controlled on site 1
        psi_g = apply_two_site_gate(psi, cnot, 2, 1,
                                    TruncParams(chi_max=0, svd_min=1e-14))
        # dense: kron order must put the gate's first axis on site 2
        vec_g = _kron_at(cnot, [2, 1], L) @ vec
        v_mps = np.asarray(M.to_statevector(psi_g))
        assert abs(abs(np.vdot(vec_g, v_mps)) - 1.0) < 1e-10

    def test_gate_does_not_disturb_distant_bonds(self):
        """A gate on sites (0, 1) must leave distant same-parity bonds'
        Schmidt data untouched (the old path re-SVD'd and renormalized
        every same-parity bond through identity gates)."""
        import scipy.linalg
        rng = np.random.default_rng(3)
        L = 8
        psi = M.create_initial_state(L, "all_up", chi=8, dtype=DTYPE)
        # entangle bonds 4-5 region first
        H4 = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        U4 = scipy.linalg.expm(-1j * 0.7 * (H4 + H4.conj().T))
        psi = apply_two_site_gate(psi, U4, 4, 5,
                                  TruncParams(chi_max=0, svd_min=1e-14))
        lam_before = np.asarray(psi.lam).copy()
        B_before = np.asarray(psi.B.re).copy()
        # now a gate far away on (0, 1) -- with a coarse chi_max that WOULD
        # truncate bond 5 if the identity-batch path were still in use
        H0 = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
        U0 = scipy.linalg.expm(-1j * 0.5 * (H0 + H0.conj().T))
        psi2 = apply_two_site_gate(psi, U0, 0, 1, {"chi_max": 2})
        np.testing.assert_array_equal(np.asarray(psi2.lam)[5],
                                      lam_before[5])
        np.testing.assert_array_equal(np.asarray(psi2.B.re)[4:],
                                      B_before[4:])

    def test_entangling_gate_vs_dense(self):
        """CZ-like diagonal gate + Hadamard-prepared pair vs dense linalg."""
        rng = np.random.default_rng(42)
        L = 5
        psi = M.create_initial_state(L, "all_up", chi=8, dtype=DTYPE)
        # random single-site rotations to create superpositions
        import scipy.linalg
        svec = None
        from tests.exact_reference import product_statevector
        vec = product_statevector([0] * L)
        gates1 = []
        for i in range(L):
            Hrand = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
            Hrand = Hrand + Hrand.conj().T
            U = scipy.linalg.expm(-1j * 0.3 * Hrand)
            gates1.append(U)
        g1 = cpx.from_numpy(np.stack(gates1), dtype=DTYPE)
        psi = M.apply_one_site_gates(psi, g1)
        from tests.exact_reference import _kron_at
        for i, U in enumerate(gates1):
            vec = _kron_at(U, [i], L) @ vec
        # now entangle with a random two-site unitary on (1,2) then (2,3)
        for (i, j) in [(1, 2), (2, 3), (0, 1)]:
            Hrand = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
            Hrand = Hrand + Hrand.conj().T
            U4 = scipy.linalg.expm(-1j * 0.7 * Hrand)
            psi = apply_two_site_gate(psi, U4, i, j, TruncParams(chi_max=0, svd_min=1e-14))
            vec = _kron_at(U4, [i, j], L) @ vec
        v_mps = np.asarray(M.to_statevector(psi))
        fidelity = abs(np.vdot(vec, v_mps))
        assert abs(fidelity - 1.0) < 1e-10
        # observables match exactly
        sz_mps = np.asarray(obs.sz_sites(psi))
        from tests.exact_reference import sz_expectations
        np.testing.assert_allclose(sz_mps, sz_expectations(vec, L), atol=1e-10)


class TestTruncation:
    def test_truncation_mask_chi_max(self):
        from timecrystal_tpu.core.truncate import truncation_mask
        S = jnp.asarray([0.9, 0.3, 0.2, 0.1])
        m = truncation_mask(S, 4, TruncParams(chi_max=2, svd_min=0.0))
        np.testing.assert_array_equal(np.asarray(m), [True, True, False, False])

    def test_truncation_mask_svd_min(self):
        from timecrystal_tpu.core.truncate import truncation_mask
        S = jnp.asarray([0.9, 0.3, 1e-13, 0.0])
        m = truncation_mask(S, 4, TruncParams(chi_max=0, svd_min=1e-12))
        np.testing.assert_array_equal(np.asarray(m), [True, True, False, False])

    def test_trunc_cut_discards_tail(self):
        from timecrystal_tpu.core.truncate import truncation_mask
        S = jnp.asarray([1.0, 0.1, 0.01, 0.001])
        # tail (0.01, 0.001): sqrt(0.0001 + 1e-6) ~ 0.01005 <= 0.02 -> both go
        m = truncation_mask(S, 4, TruncParams(chi_max=0, svd_min=0.0, trunc_cut=0.02))
        np.testing.assert_array_equal(np.asarray(m), [True, True, False, False])


class TestObservables:
    def test_loschmidt_self_is_one(self):
        psi = M.create_initial_state(8, "neel", chi=8, dtype=DTYPE)
        assert abs(float(obs.calculate_loschmidt_echo(psi, psi)) - 1.0) < 1e-12

    def test_loschmidt_orthogonal_is_zero(self):
        a = M.create_initial_state(8, "all_up", chi=8, dtype=DTYPE)
        b = M.create_initial_state(8, "all_down", chi=8, dtype=DTYPE)
        assert float(obs.calculate_loschmidt_echo(a, b)) < 1e-14

    def test_magnetization_extremes(self):
        up = M.create_initial_state(8, "all_up", chi=8, dtype=DTYPE)
        dn = M.create_initial_state(8, "all_down", chi=8, dtype=DTYPE)
        ne = M.create_initial_state(8, "neel", chi=8, dtype=DTYPE)
        assert abs(float(obs.magnetization(up, "z")) - 8.0) < 1e-12
        assert abs(float(obs.magnetization(dn, "z")) + 8.0) < 1e-12
        assert abs(float(obs.magnetization(ne, "z"))) < 1e-12

    def test_staggered_neel_is_one(self):
        ne = M.create_initial_state(8, "neel", chi=8, dtype=DTYPE)
        assert abs(float(obs.staggered_magnetization(ne)) - 1.0) < 1e-12

    def test_correlation_product_state(self):
        ne = M.create_initial_state(6, "neel", chi=8, dtype=DTYPE)
        # <Z_0 Z_1> on neel = (+1)(-1) = -1; <Z_0 Z_2> = +1
        assert abs(complex(correlation(ne, 0, 1)) + 1.0) < 1e-12
        assert abs(complex(correlation(ne, 0, 2)) - 1.0) < 1e-12
        assert abs(complex(correlation(ne, 3, 3)) - 1.0) < 1e-12  # Z.Z = I

    def test_entropy_product_state_zero(self):
        psi = M.create_initial_state(8, "neel", chi=8, dtype=DTYPE)
        ent = np.asarray(M.entanglement_entropy(psi))
        np.testing.assert_allclose(ent, 0.0, atol=1e-12)

    def test_participation_ratio_normalized_state(self):
        psi = M.create_initial_state(8, "neel", chi=8, dtype=DTYPE)
        # densities are 1 per site -> PR = L^2 / L = L
        assert abs(float(obs.participation_ratio(psi)) - 8.0) < 1e-10


def correlation(psi, i, j):
    return complex(cpx.to_numpy(obs.correlation_function(psi, "z", "z", i, j)))


class TestSpectral:
    def test_pure_subharmonic_high_amplitude(self):
        t = np.arange(100) * 1.0
        period = 2.0
        sig = np.cos(2 * np.pi * t / (2 * period))  # period-doubled
        amp = float(obs.extract_subharmonic_amplitude(t, sig, period))
        assert amp > 0.8

    def test_pure_fundamental_low_subharmonic(self):
        t = np.arange(100) * 0.5
        period = 2.0
        sig = np.cos(2 * np.pi * t / period)
        amp = float(obs.extract_subharmonic_amplitude(t, sig, period))
        assert amp < 0.2

    def test_short_series_returns_zero(self):
        t = np.arange(5) * 1.0
        assert float(obs.extract_subharmonic_amplitude(t, np.ones(5), 2.0)) == 0.0

    def test_weight_fraction_nonsaturating(self):
        """subharmonic_weight_fraction: near-1 for a pure period-doubled
        signal, near-0 for a pure fundamental, and -- unlike A2T, which
        plateaus at exactly 1.0 -- strictly decreasing as weight moves to
        other frequencies while the omega/2 bin still dominates."""
        t = np.arange(100) * 1.0
        period = 2.0
        pure = np.cos(2 * np.pi * t / (2 * period))
        fund = np.cos(2 * np.pi * t / period)
        assert obs.subharmonic_weight_fraction(t, pure, period) > 0.95
        assert obs.subharmonic_weight_fraction(t, fund, period) < 0.1
        assert obs.subharmonic_weight_fraction(t, np.ones(5), period) == 0.0
        # 70/30 mix: A2T saturates (omega/2 still the max bin), the
        # weight fraction does not
        mixed = 0.7 * pure + 0.3 * fund
        a2t_mix = obs.extract_subharmonic_amplitude(t, mixed, period)
        w_pure = obs.subharmonic_weight_fraction(t, pure, period)
        w_mix = obs.subharmonic_weight_fraction(t, mixed, period)
        assert a2t_mix > 0.99          # the saturating metric is blind here
        assert 0.5 < w_mix < 0.9 * w_pure   # the fraction keeps gradient

    def test_fourier_spectrum_peak_location(self):
        t = np.arange(200) * 1.0
        period = 4.0
        sig = np.cos(2 * np.pi * t / (2 * period))
        freqs, power = obs.calculate_fourier_spectrum(t, sig, period)
        freqs, power = np.asarray(freqs), np.asarray(power)
        assert abs(freqs[np.argmax(power)] - 0.5) < 0.05

    def test_period_doubling_detector(self):
        alternating = [1.0, 0.1] * 20
        rand = list(np.random.default_rng(0).uniform(0, 1, 40))
        assert float(obs.detect_period_doubling_from_loschmidt(alternating)) > 0.5
        assert float(obs.detect_period_doubling_from_loschmidt(alternating)) > \
            float(obs.detect_period_doubling_from_loschmidt(rand))


class TestBatchedSingleBondConsistency:
    def test_batched_matches_single_bond(self):
        """apply_bond_gates (the hot batched path) and apply_single_bond_gate
        (bond_update_core: site-shard boundaries, periodic swap network)
        deliberately duplicate the update algebra -- this test pins the two
        implementations together so a fix to one cannot silently drift the
        other (see the NOTE in truncate.apply_bond_gates)."""
        from timecrystal_tpu.core.truncate import (apply_bond_gates,
                                                   apply_single_bond_gate)
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, chi = 8, 8
        hf = draw_disorder_reference(L, 0.3, 7)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, DTYPE), 0.9,
                                   theta=0.93 * np.pi, dtype=DTYPE)
        tp = TruncParams(chi_max=0, svd_min=1e-12)
        psi = M.create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        # entangle a little first so the update is not rank-1 trivial
        psi, _ = apply_bond_gates(psi, gates.bond_gates, 0, tp)
        psi, _ = apply_bond_gates(psi, gates.bond_gates, 1, tp)

        batched, err_b = apply_bond_gates(psi, gates.bond_gates, 0, tp)
        single, err_s = psi, jnp.zeros((), psi.lam.dtype)
        for b in range(0, L - 1, 2):
            single, e = apply_single_bond_gate(single, gates.bond_gates[b],
                                               b, tp)
            err_s = err_s + e
        np.testing.assert_allclose(np.asarray(batched.lam),
                                   np.asarray(single.lam), atol=1e-13)
        np.testing.assert_allclose(np.asarray(batched.B.re),
                                   np.asarray(single.B.re), atol=1e-13)
        np.testing.assert_allclose(np.asarray(batched.B.im),
                                   np.asarray(single.B.im), atol=1e-13)
        np.testing.assert_allclose(float(err_b), float(err_s), atol=1e-15)


class TestZZCorrelationProfile:
    def test_matches_pairwise_and_dense(self):
        """zz_correlation_profile == per-pair correlation_function == the
        dense statevector oracle, at every anchor position class (edge,
        bulk, far edge), on a genuinely entangled state."""
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, chi = 8, 16
        hf = draw_disorder_reference(L, 0.3, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, DTYPE), 0.9,
                                   theta=0.92 * np.pi, dtype=DTYPE)
        psi0 = M.create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        psi, _ = evolve_floquet_scan(psi0, gates, 5,
                                     TruncParams(chi_max=0, svd_min=1e-14))
        v = np.asarray(M.to_statevector(psi))
        sz = np.diag([1.0, -1.0])

        def dense_zz(i, j):
            op = np.ones((1, 1))
            for k in range(L):
                op = np.kron(op, sz if k in (i, j) else np.eye(2))
            return float(np.real(v.conj() @ (op @ v)))

        for i in (0, 3, L - 1):
            prof = np.asarray(obs.zz_correlation_profile(psi, i))
            pair = np.array([1.0 if j == i else
                             float(obs.correlation_function(
                                 psi, "z", "z", i, j).re)
                             for j in range(L)])
            np.testing.assert_allclose(prof, pair, atol=1e-13)
            dense = np.array([dense_zz(i, j) if j != i
                              else float(np.real(v.conj() @ v))
                              for j in range(L)])
            np.testing.assert_allclose(prof, dense, atol=1e-12)
