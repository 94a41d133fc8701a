"""Generic Suzuki-Trotter TEBD path (TEBDEvolution) + chi escalation.

The reference's TEBDEvolution wraps TeNPy's order-2 TEBDEngine for
arbitrary nearest-neighbor models (tebd_evolution.py:18-188); these tests
validate our equivalent against dense expm and pin its info contract.
"""

import jax.numpy as jnp
import numpy as np
import scipy.linalg

from tests.exact_reference import _kron_at

from timecrystal_tpu.core import gates as G
from timecrystal_tpu.core.mps import create_initial_state, to_statevector
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.tebd import (TEBDEvolution, evolve_floquet_auto,
                                           evolve_floquet_scan,
                                           spin_chain_model)

DTYPE = jnp.float64


def _dense_H(nn, L):
    H = np.zeros((2**L, 2**L), dtype=complex)
    for b in range(L - 1):
        H += _kron_at(nn.bond_H[b].reshape(4, 4), [b, b + 1], L)
    return H


class TestTrotterEvolution:
    def test_matches_dense_expm(self):
        """Order-2 Trotter on a transverse-field chain vs dense expm."""
        L, chi = 6, 16
        nn = spin_chain_model(L, Jz=1.0, hx=0.6, hz=0.2)
        eng = TEBDEvolution(nn, dt=0.02, max_chi=chi,
                            trunc_params={"svd_min": 1e-14})
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        states, times, info = eng.evolve(psi0, total_time=0.5)
        H = _dense_H(nn, L)
        vec_T = scipy.linalg.expm(-1j * H * times[-1]) @ to_statevector(psi0)
        ov = np.vdot(vec_T, to_statevector(states[-1]))
        # order-2 Trotter error ~ dt^2 * T
        assert abs(abs(ov) - 1.0) < 1e-4
        assert info["n_steps"] == 25
        for key in ("wall_time", "bond_dimensions", "entanglement_entropies",
                    "truncation_errors", "final_bond_dim"):
            assert key in info

    def test_traces_path_matches_states_path(self):
        L, chi = 6, 16
        nn = spin_chain_model(L, Jz=1.0, hx=0.5)
        eng = TEBDEvolution(nn, dt=0.05, max_chi=chi,
                            trunc_params={"svd_min": 1e-14})
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        states, times, info = eng.evolve(psi0, total_time=0.25)
        traces, info2 = eng.evolve_traces(psi0, total_time=0.25)
        # same final entropy profile
        from timecrystal_tpu.core.mps import entanglement_entropy
        np.testing.assert_allclose(np.asarray(entanglement_entropy(states[-1])),
                                   traces["entropies"][-1], atol=1e-10)

    def test_benchmark_performance_contract(self):
        nn = spin_chain_model(6, Jz=1.0, hx=0.5)
        eng = TEBDEvolution(nn, dt=0.05, max_chi=8)
        out = eng.benchmark_performance(
            create_initial_state(6, "neel", chi=8, dtype=DTYPE), n_steps=4)
        for key in ("wall_time", "steps_per_second", "final_bond_dim",
                    "memory_usage", "truncation_error"):
            assert key in out

    def test_suzuki_trotter_gates(self):
        eng = TEBDEvolution(spin_chain_model(4), dt=0.1)
        terms = {"zz": np.kron(np.diag([1., -1.]), np.diag([1., -1.])),
                 "single_site_terms": np.eye(2)}
        gates = eng.suzuki_trotter_gates(terms, 0.1)
        assert len(gates) == 1
        np.testing.assert_allclose(gates[0],
                                   scipy.linalg.expm(-1j * 0.1 * terms["zz"]),
                                   atol=1e-12)


class TestChiEscalation:
    def test_rank1_stays_at_first_level(self):
        """Exact pi pulse: chi never grows, first (cheapest) level used."""
        kwargs = dict(n_sites=10, J=1.0, h_disorder=0.3, tau=1.0,
                      disorder_seed=42, dtype=DTYPE)
        traces, times, info, model = evolve_floquet_auto(
            kwargs, "neel", 10, {"chi_max": 64, "svd_min": 1e-12},
            chi_start=8, chi_limit=64)
        assert info["chi_pad_used"] == 8
        assert int(np.max(traces["max_chi"])) == 1

    def test_escalates_when_saturated(self):
        """Entangling pulse at tiny starting pad: escalation kicks in."""
        kwargs = dict(n_sites=8, J=1.0, h_disorder=0.3, tau=1.2,
                      disorder_seed=7, theta=0.85 * np.pi, dtype=DTYPE)
        traces, times, info, model = evolve_floquet_auto(
            kwargs, "neel", 8, {"chi_max": 0, "svd_min": 1e-10},
            chi_start=4, chi_limit=16)
        assert info["chi_pad_used"] > 4
        # at the final level the evolution is the one reported
        assert traces["sz_sites"].shape == (9, 8)

    def test_staged_merged_matches_fixed_strict(self):
        """The bench path (chi-staged + merged frame) reproduces the
        fixed-full-chi strict-frame observables exactly: escalation re-runs
        saturated chunks from the still-exact pre-chunk state, and the
        half-step frame leaves sz/staggered/LE invariant."""
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        kwargs = dict(n_sites=10, J=1.0, h_disorder=0.3, tau=1.1,
                      disorder_seed=11, theta=0.9 * np.pi, dtype=DTYPE)
        n = 10
        tp_d = {"chi_max": 0, "svd_min": 1e-12}
        traces, times, info, model = evolve_floquet_auto(
            kwargs, "neel", n, tp_d, chi_start=4, chi_limit=32,
            chunk_periods=3, frame="merged")
        assert info["chi_pad_used"] > 4       # staging actually exercised

        hf = draw_disorder_reference(10, 0.3, 11)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, DTYPE), 1.1,
                                   theta=0.9 * np.pi, dtype=DTYPE)
        psi0 = create_initial_state(10, "neel", chi=32, dtype=DTYPE)
        _, ref = evolve_floquet_scan(psi0, gates, n,
                                     TruncParams.from_dict(tp_d),
                                     frame="strict")
        np.testing.assert_allclose(traces["sz_sites"][1:],
                                   np.asarray(ref["sz_sites"]), atol=1e-9)
        np.testing.assert_allclose(traces["loschmidt_echo"][1:],
                                   np.asarray(ref["loschmidt_echo"]),
                                   atol=1e-9)


    def test_seedless_disorder_pinned_across_escalation(self):
        """disorder_seed=None with h_disorder>0: the fields drawn by the
        FIRST model build must be reused bit-identically by every ladder
        rebuild (round-2 VERDICT weak #2: a seedless run redrew fresh
        fields from the global RNG at each escalation, silently changing
        the Hamiltonian mid-run).  Proof: rerunning with the realized
        fields passed explicitly reproduces the traces exactly."""
        kwargs = dict(n_sites=8, J=1.0, h_disorder=0.3, tau=1.2,
                      theta=0.85 * np.pi, dtype=DTYPE)  # no disorder_seed
        traces, times, info, model = evolve_floquet_auto(
            kwargs, "neel", 8, {"chi_max": 0, "svd_min": 1e-10},
            chi_start=4, chi_limit=16, chunk_periods=2)
        assert len(info["chi_escalations"]) >= 1  # ladder actually walked
        kwargs2 = dict(kwargs, h_fields=np.asarray(model.h_fields))
        traces2, _, info2, _ = evolve_floquet_auto(
            kwargs2, "neel", 8, {"chi_max": 0, "svd_min": 1e-10},
            chi_start=4, chi_limit=16, chunk_periods=2)
        np.testing.assert_array_equal(traces["sz_sites"], traces2["sz_sites"])
        np.testing.assert_array_equal(traces["loschmidt_echo"],
                                      traces2["loschmidt_echo"])

    def test_cap_svd_method_routes_at_cap(self):
        """cap_svd_method='jacobi_proj': chunks AT the ladder cap route
        through the projected fast path (counted via the module hook the
        csvd dispatcher resolves at call time), chunks below the cap do
        not, and with the cap at the system's full rank (L=6 -> mid-bond
        rank 8 == chi_limit, no real truncation) the traces match the
        default driver at f64 exactness."""
        import jax

        from timecrystal_tpu.ops.pallas import jacobi_svd as jsvd_mod

        kwargs = dict(n_sites=6, J=1.0, h_disorder=0.3, tau=1.2,
                      disorder_seed=7, theta=0.85 * np.pi, dtype=DTYPE)
        tpd = {"chi_max": 0, "svd_min": 1e-12}
        ref, _, info_ref, _ = evolve_floquet_auto(
            kwargs, "neel", 8, tpd, chi_start=4, chi_limit=8,
            chunk_periods=2)
        assert info_ref["chi_pad_used"] == 8    # the ladder reaches the cap

        calls: list = []
        orig = jsvd_mod.jacobi_proj

        def counting(theta, k, **kw):
            calls.append(int(k))
            return orig(theta, k, **kw)

        jsvd_mod.jacobi_proj = counting
        jax.clear_caches()   # force retrace so the hook is captured
        try:
            tr, _, info, _ = evolve_floquet_auto(
                kwargs, "neel", 8, tpd, chi_start=4, chi_limit=8,
                chunk_periods=2, cap_svd_method="jacobi_proj")
        finally:
            jsvd_mod.jacobi_proj = orig
        assert info["chi_pad_used"] == 8
        assert calls, "cap chunks never reached jacobi_proj"
        assert all(k == 8 for k in calls)       # only cap-chi (8) panels
        for key in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(tr[key], ref[key], atol=1e-8)


    def test_projected_svd_guarded_below_cap(self):
        """A caller passing TruncParams(svd_method='jacobi_core') no longer
        poisons below-cap escalation decisions (round-4 VERDICT weak #2):
        below the cap the driver overrides to the bit-faithful 'jacobi'
        kernel, so chunks below the cap never reach the projected path
        (counted via a module hook) and the chi schedule is identical to
        the default run.  At the cap the caller's method routes as given
        (equivalent to cap_svd_method)."""
        import jax

        from timecrystal_tpu.ops.pallas import jacobi_svd as jsvd_mod

        kwargs = dict(n_sites=6, J=1.0, h_disorder=0.3, tau=1.2,
                      disorder_seed=7, theta=0.85 * np.pi, dtype=DTYPE)
        ref, _, info_ref, _ = evolve_floquet_auto(
            kwargs, "neel", 8, {"chi_max": 0, "svd_min": 1e-12},
            chi_start=4, chi_limit=8, chunk_periods=2)
        assert info_ref["chi_pad_used"] == 8

        calls: list = []
        orig = jsvd_mod.jacobi_core

        def counting(theta, k, **kw):
            calls.append(int(k))
            return orig(theta, k, **kw)

        jsvd_mod.jacobi_core = counting
        jax.clear_caches()
        try:
            tr, _, info, _ = evolve_floquet_auto(
                kwargs, "neel", 8,
                {"chi_max": 0, "svd_min": 1e-12,
                 "svd_method": "jacobi_core"},
                chi_start=4, chi_limit=8, chunk_periods=2)
        finally:
            jsvd_mod.jacobi_core = orig
        # schedule identical to the clean run: no poisoned escalation
        assert info["chi_escalations"] == info_ref["chi_escalations"]
        assert info["chi_pad_used"] == 8
        # the projected kernel ran ONLY at the cap chi (k=8), never below
        assert calls and all(k == 8 for k in calls)
        for key in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(tr[key], ref[key], atol=1e-8)


class TestStageDecision:
    """Unit tests for the chi-staging escalation criteria (the measured
    f32 failure modes are documented in tebd._stage_decision)."""

    def test_trunc_err_gates_saturation(self):
        from timecrystal_tpu.dynamics.tebd import _stage_decision

        lam = np.zeros((9, 16))
        lam[:, 0] = 1.0
        sat, ahead = _stage_decision(np.array([1e-12, 1e-10]), lam, 16, 1e-8)
        assert not sat and not ahead          # noise-level truncation
        sat, _ = _stage_decision(np.array([1e-12, 1e-6]), lam, 16, 1e-8)
        assert sat                            # real weight lost

    def test_junk_sigmas_do_not_trigger_ahead(self):
        from timecrystal_tpu.dynamics.tebd import _stage_decision

        # bond with 4 significant Schmidt values + 12 junk at 1e-6 of max:
        # raw occupancy is 16/16, significant rank is 4 -> no ahead
        lam = np.full((9, 16), 1e-6)
        lam[:, :4] = 0.5
        sat, ahead = _stage_decision(np.array([0.0]), lam, 16, 1e-8)
        assert not sat and not ahead
        # genuinely full significant occupancy (15/16) -> ahead
        lam2 = np.full((9, 16), 0.1)
        lam2[:, 15] = 0.0
        _, ahead2 = _stage_decision(np.array([0.0]), lam2, 16, 1e-8)
        assert ahead2

    def test_batched_lam_axes(self):
        from timecrystal_tpu.dynamics.tebd import _stage_decision

        # [R, L+1, chi] batched exit lam: any realization's occupancy counts
        lam = np.zeros((3, 9, 16))
        lam[..., :2] = 0.3
        lam[2, 4, :] = 0.2                    # one realization, one bond full
        _, ahead = _stage_decision(np.zeros((3, 5)), lam, 16, 1e-8)
        assert ahead


class TestMeasureEvery:
    """In-scan sparse measurement: observables computed only at measurement
    periods (round-1 review: they were computed every period and the host
    discarded the rest)."""

    def test_in_scan_measure_every_matches_dense(self):
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, chi, n = 8, 16, 12
        hf = draw_disorder_reference(L, 0.3, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float64), 0.9,
                                   theta=0.92 * np.pi, dtype=jnp.float64)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=jnp.float64)
        tp = TruncParams(chi_max=0, svd_min=1e-14, svd_method="native")
        for frame in ("strict", "merged"):
            _, dense = evolve_floquet_scan(psi0, gates, n, tp, frame=frame)
            _, sparse = evolve_floquet_scan(psi0, gates, n, tp, frame=frame,
                                            measure_every=3)
            np.testing.assert_array_equal(
                np.asarray(dense["loschmidt_echo"])[2::3],
                np.asarray(sparse["loschmidt_echo"]))
            np.testing.assert_array_equal(
                np.asarray(dense["sz_sites"])[2::3],
                np.asarray(sparse["sz_sites"]))
            np.testing.assert_array_equal(
                np.asarray(dense["trunc_err"])[2::3],
                np.asarray(sparse["trunc_err"]))

    def test_trunc_err_boundary_key(self):
        """Both frames expose trunc_err_boundary (merged: entry/exit
        half-step truncation the per-period trace never sees; strict:
        exactly zero).  The staged drivers fold it into saturation."""
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L = 8
        hf = draw_disorder_reference(L, 0.3, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float64), 0.9,
                                   theta=0.92 * np.pi, dtype=jnp.float64)
        psi0 = create_initial_state(L, "neel", chi=16, dtype=jnp.float64)
        tp = TruncParams(chi_max=0, svd_min=1e-14, svd_method="native")
        for frame, bound in (("strict", 0.0), ("merged", 1e-20)):
            _, tr = evolve_floquet_scan(psi0, gates, 4, tp, frame=frame)
            assert "trunc_err_boundary" in tr
            assert float(np.asarray(tr["trunc_err_boundary"])) <= bound

    def test_non_divisor_rejected(self):
        import pytest

        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)
        hf = draw_disorder_reference(6, 0.3, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float64), 0.9,
                                   dtype=jnp.float64)
        psi0 = create_initial_state(6, "neel", chi=8, dtype=jnp.float64)
        with pytest.raises(ValueError):
            evolve_floquet_scan(psi0, gates, 10,
                                TruncParams(svd_min=1e-14), measure_every=3)


class TestAutoDriverEdges:
    """Regression tests for review findings on evolve_floquet_auto and
    CustomFloquet (round-3 review sweep)."""

    _MK = dict(n_sites=8, J=1.0, h_disorder=0.3, tau=1.0, disorder_seed=11,
               theta=0.93 * np.pi, dtype=DTYPE)

    def test_random_state_single_draw_and_resume(self, tmp_path):
        """state_type='random': the initial-state basis is realized ONCE
        (t=0 trace row, Loschmidt reference, ladder rebuilds) and a
        checkpoint resume restores THAT realization instead of redrawing
        -- even when the resuming process draws differently (state_rng
        deliberately different on resume)."""
        kw = dict(trunc_params=TruncParams(chi_max=0, svd_min=1e-12),
                  chi_start=4, chi_limit=16, chunk_periods=2)
        straight, t_s, _, _ = evolve_floquet_auto(
            self._MK, "random", 4, state_rng=np.random.default_rng(5), **kw)
        ck = str(tmp_path / "ck")
        evolve_floquet_auto(self._MK, "random", 2, checkpoint_dir=ck,
                            state_rng=np.random.default_rng(5), **kw)
        resumed, t_r, _, _ = evolve_floquet_auto(
            self._MK, "random", 4, checkpoint_dir=ck,
            state_rng=np.random.default_rng(99), **kw)   # wrong draw: unused
        assert t_r == t_s
        for k in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(resumed[k], straight[k], atol=1e-12,
                                       err_msg=k)

    def test_zero_periods(self):
        """n_periods=0 returns initial-row-only traces, not a crash."""
        traces, times, info, _ = evolve_floquet_auto(
            self._MK, "neel", 0,
            trunc_params=TruncParams(chi_max=0, svd_min=1e-12),
            chi_start=4, chi_limit=8)
        assert times == [0.0]
        assert traces["sz_sites"].shape == (1, 8)
        assert float(traces["loschmidt_echo"][0]) == 1.0
        assert info["n_periods"] == 0

    def test_evolve_floquet_in_scan_measure_every(self):
        """CustomFloquet.evolve_floquet(measure_every=m | m divides n)
        stores states in-scan at the reference grid: same states/times as
        the dense run subsampled host-side."""
        from timecrystal_tpu.core.mps import overlap
        from timecrystal_tpu.dynamics.tebd import CustomFloquet
        from timecrystal_tpu.models.kicked_ising import KickedIsingModel
        from timecrystal_tpu.ops import cpx

        m = KickedIsingModel(**{**self._MK, "chi": 16})
        tp = TruncParams(chi_max=0, svd_min=1e-12)
        psi0 = create_initial_state(8, "neel", chi=16, dtype=DTYPE)
        dense_states, dense_times, _ = CustomFloquet(m, tp) \
            .evolve_floquet(psi0, 6, measure_every=1)
        sparse_states, sparse_times, info = CustomFloquet(m, tp) \
            .evolve_floquet(psi0, 6, measure_every=2)
        assert sparse_times == [dense_times[i] for i in (0, 1, 3, 5)]
        for s_sp, s_d in zip(sparse_states,
                             [dense_states[i] for i in (0, 1, 3, 5)]):
            ov = float(cpx.abs2(overlap(s_sp, s_d)))
            np.testing.assert_allclose(ov, 1.0, atol=1e-12)
        assert len(info["bond_dimensions"]) == len(sparse_states)

    def test_custom_floquet_partial_dict_keeps_defaults(self):
        """A partial trunc_params dict keeps the None-path defaults for
        missing keys (chi_max=100, trunc_cut=1e-10) instead of silently
        uncapping chi."""
        from timecrystal_tpu.dynamics.tebd import CustomFloquet
        from timecrystal_tpu.models.kicked_ising import KickedIsingModel

        m = KickedIsingModel(**{**self._MK, "chi": 16})
        tp = CustomFloquet(m, {"svd_min": 1e-7}).trunc_params
        assert tp.chi_max == 100
        assert tp.trunc_cut == 1e-10
        assert tp.svd_min == 1e-7

    def test_tebd_evolution_final_bond_dim_scalar(self):
        """TEBDEvolution.evolve's info['final_bond_dim'] is a scalar like
        every other driver (the per-bond profile stays in
        info['bond_dimensions'])."""
        L, chi = 6, 16
        nn = spin_chain_model(L, Jz=1.0, hx=0.6, hz=0.2)
        eng = TEBDEvolution(nn, dt=0.05, max_chi=chi,
                            trunc_params={"svd_min": 1e-14})
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        _, _, info = eng.evolve(psi0, total_time=0.2)
        assert isinstance(info["final_bond_dim"], int)
        assert info["final_bond_dim"] >= 1


class TestCorrelationTraces:
    def test_in_scan_zz_corr_matches_states_and_frames(self):
        """correlation_site traces: (a) equal to post-hoc per-state
        computation on the materialized-states path, (b) identical between
        strict and merged frames (z-diagonal observables are frame-exact),
        (c) present in the CustomFloquet trace contract with the t=0 row."""
        import jax.numpy as jnp

        from timecrystal_tpu.core import observables as obs
        from timecrystal_tpu.dynamics.tebd import (CustomFloquet,
                                                   evolve_floquet_scan)
        from timecrystal_tpu.models.kicked_ising import KickedIsingModel

        L, chi, n, site = 8, 16, 6, 3
        m = KickedIsingModel(n_sites=L, J=1.0, h_disorder=0.3, tau=0.9,
                             disorder_seed=11, theta=0.93 * np.pi, chi=chi,
                             dtype=DTYPE)
        tp = TruncParams(chi_max=0, svd_min=1e-14)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)

        traces, times, _ = CustomFloquet(m, tp).evolve_floquet_traces(
            psi0, n, correlation_site=site)
        assert traces["zz_corr"].shape == (n + 1, L)
        # t=0 row: Neel product state -> zz = +-1 exactly
        np.testing.assert_allclose(traces["zz_corr"][0],
                                   [(-1.0) ** (abs(j - site) % 2)
                                    for j in range(L)], atol=1e-14)

        # (a) against the state-history path
        states, _, _ = CustomFloquet(m, tp).evolve_floquet(psi0, n)
        for t, psi_t in enumerate(states):
            ref = np.asarray(obs.zz_correlation_profile(psi_t, site))
            np.testing.assert_allclose(traces["zz_corr"][t], ref, atol=1e-12)

        # (b) merged frame identical
        _, tr_m = evolve_floquet_scan(psi0, m.gates, n, tp, frame="merged",
                                      correlation_site=site)
        np.testing.assert_allclose(np.asarray(tr_m["zz_corr"]),
                                   traces["zz_corr"][1:], atol=1e-12)


class TestTwoTimeCorrelator:
    """evolve_two_time_zz: C(r, t) = <sz_i(0) sz_j(t)> vs the dense
    statevector oracle, plus frame equivalence and the t=0 contract."""

    def _exact_rows(self, L, h, tau, theta, anchor, n):
        from tests.exact_reference import (SZ, floquet_unitary,
                                           neel_indices, product_statevector)

        U = floquet_unitary(L, 1.0, np.asarray(h), tau, theta)
        v = product_statevector(neel_indices(L))
        w = _kron_at(SZ, [anchor], L) @ v          # sz_anchor |psi0>
        Zj = [_kron_at(SZ, [j], L) for j in range(L)]
        rows = []
        for _ in range(n):
            v, w = U @ v, U @ w
            rows.append([np.vdot(w, Zj[j] @ v) for j in range(L)])
        return np.asarray(rows)                     # [n, L] complex

    def test_matches_dense_oracle_and_frames(self):
        from timecrystal_tpu.core.observables import zz_correlation_profile
        from timecrystal_tpu.dynamics.tebd import evolve_two_time_zz
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, chi, n, anchor, tau = 8, 16, 6, 3, 0.9
        theta = 0.93 * np.pi
        h = draw_disorder_reference(L, 0.3, 11)
        gates = make_floquet_gates(1.0, jnp.asarray(h, DTYPE), tau,
                                   theta=theta, dtype=DTYPE)
        tp = TruncParams(chi_max=0, svd_min=1e-14)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)

        _, tr = evolve_two_time_zz(psi0, gates, n, tp, anchor=anchor)
        c = np.asarray(tr["zz2t_re"]) + 1j * np.asarray(tr["zz2t_im"])
        exact = self._exact_rows(L, h, tau, theta, anchor, n)
        np.testing.assert_allclose(c, exact, atol=1e-8)

        # merged frame: identical correlator (W is z-diagonal)
        _, tr_m = evolve_two_time_zz(psi0, gates, n, tp, anchor=anchor,
                                     frame="merged")
        np.testing.assert_allclose(np.asarray(tr_m["zz2t_re"]),
                                   np.asarray(tr["zz2t_re"]), atol=1e-10)
        np.testing.assert_allclose(np.asarray(tr_m["zz2t_im"]),
                                   np.asarray(tr["zz2t_im"]), atol=1e-10)

        # t=0: the two-time and equal-time profiles coincide by definition
        c0 = np.asarray(zz_correlation_profile(psi0, anchor))
        np.testing.assert_allclose(
            c0, [(-1.0) ** (abs(j - anchor) % 2) for j in range(L)],
            atol=1e-14)

    def test_measure_every(self):
        from timecrystal_tpu.dynamics.tebd import evolve_two_time_zz
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, chi, n = 8, 16, 6
        h = draw_disorder_reference(L, 0.3, 11)
        gates = make_floquet_gates(1.0, jnp.asarray(h, DTYPE), 0.9,
                                   theta=0.93 * np.pi, dtype=DTYPE)
        tp = TruncParams(chi_max=0, svd_min=1e-14)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        _, dense = evolve_two_time_zz(psi0, gates, n, tp, anchor=3)
        _, sparse = evolve_two_time_zz(psi0, gates, n, tp, anchor=3,
                                       measure_every=2)
        np.testing.assert_allclose(np.asarray(sparse["zz2t_re"]),
                                   np.asarray(dense["zz2t_re"])[1::2],
                                   atol=1e-12)

    def test_dtc_subharmonic_alternation(self):
        """In the DTC regime the two-time map alternates with O(1)
        amplitude: C(anchor, t) flips sign every period while the
        equal-time value stays ~ +1."""
        from timecrystal_tpu.dynamics.tebd import evolve_two_time_zz
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, chi, n, anchor = 10, 32, 12, 5
        h = draw_disorder_reference(L, 0.2, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(h, DTYPE), 1.0,
                                   theta=0.98 * np.pi, dtype=DTYPE)
        tp = TruncParams(chi_max=0, svd_min=1e-12)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
        _, tr = evolve_two_time_zz(psi0, gates, n, tp, anchor=anchor)
        onsite = np.asarray(tr["zz2t_re"])[:, anchor]
        signs = (-1.0) ** (np.arange(1, n + 1))
        assert np.all(onsite * signs > 0.5), onsite
