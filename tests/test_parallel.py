"""Parallelism tests: vmapped ensembles, mesh sharding, phase-grid batches.

Runs on the virtual 8-device CPU mesh (conftest).  These are the
multi-chip tests the reference has no analog of (SURVEY.md section 4
implication: 'multi-chip tests for the vmap/pmap sweep paths').
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from timecrystal_tpu.core.mps import create_initial_state
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.tebd import CustomFloquet
from timecrystal_tpu.models.kicked_ising import KickedIsingModel
from timecrystal_tpu.parallel.sweep import (SweepSpec, _basis_indices,
                                            disorder_ensemble, evolve_batch,
                                            evolve_batch_sharded,
                                            phase_grid_batch)

TP = TruncParams(chi_max=0, svd_min=1e-12)


def _spec(L=8, chi=16, n=6, theta=0.95 * float(np.pi)):
    return SweepSpec(L=L, chi=chi, n_periods=n, theta=theta, tp=TP,
                     dtype="float64")


class TestBatchedEvolution:
    def test_batch_matches_single(self):
        """vmapped batch element == standalone CustomFloquet run."""
        spec = _spec()
        hf = np.stack([
            np.random.RandomState(1).uniform(-0.3, 0.3, spec.L),
            np.random.RandomState(2).uniform(-0.4, 0.4, spec.L),
        ])
        taus = jnp.asarray([1.0, 1.3])
        basis = _basis_indices(spec.L, "neel")
        tr = evolve_batch(jnp.asarray(hf), taus, jnp.asarray(basis), spec)

        for k in range(2):
            m = KickedIsingModel(spec.L, 1.0, 0.0, float(taus[k]),
                                 h_fields=hf[k], theta=spec.theta,
                                 chi=spec.chi, dtype=jnp.float64)
            psi0 = create_initial_state(spec.L, "neel", chi=spec.chi,
                                        dtype=jnp.float64)
            ref, _, _ = CustomFloquet(m, TP).evolve_floquet_traces(psi0, spec.n_periods)
            np.testing.assert_allclose(np.asarray(tr["sz_sites"])[k],
                                       ref["sz_sites"], atol=1e-10)
            np.testing.assert_allclose(np.asarray(tr["loschmidt_echo"])[k],
                                       ref["loschmidt_echo"], atol=1e-10)

    def test_sharded_matches_unsharded(self):
        """8-device mesh sharding is numerically a no-op."""
        assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
        spec = _spec(n=4)
        R = 11  # deliberately not divisible by 8 (exercises padding)
        rng = np.random.default_rng(0)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (R, spec.L)))
        taus = jnp.asarray(rng.uniform(0.8, 1.5, R))
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        ref = evolve_batch(hf, taus, basis, spec)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
        out = evolve_batch_sharded(hf, taus, basis, spec, mesh=mesh)
        for k in ("sz_sites", "loschmidt_echo", "max_chi"):
            np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                       atol=1e-12)

    def test_batch_auto_matches_fixed_chi(self):
        """Chi-staged ensemble evolution (evolve_batch_auto) reproduces the
        fixed-full-chi batch observables exactly: escalation re-runs
        saturated chunks from still-exact states, so staging is numerically
        invisible.  Entangling theta so the staging actually escalates."""
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        spec = _spec(L=10, chi=32, n=10, theta=0.9 * float(np.pi))
        rng = np.random.default_rng(3)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (3, spec.L)))
        taus = jnp.asarray(rng.uniform(0.9, 1.2, 3))
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        ref = evolve_batch(hf, taus, basis, spec)
        tr, info = evolve_batch_auto(hf, taus, basis, spec, chi_start=4,
                                     chunk_periods=3)
        assert info["chi_pad_used"] > 4          # staging exercised
        for k in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(tr[k], np.asarray(ref[k]), atol=1e-9)

    def test_batch_auto_correlation_site_matches_fixed_chi(self):
        """correlation_site on the chi-staged path (round-4 VERDICT seam
        #3b: previously NotImplementedError): zz_corr joins the chunk
        trace contract, staged == fixed-chi including across an
        escalation, and the staged checkpoint layout round-trips the key
        (kill after the first chunk, resume, identical traces)."""
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        spec = _spec(L=10, chi=32, n=10, theta=0.9 * float(np.pi))
        rng = np.random.default_rng(3)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (3, spec.L)))
        taus = jnp.asarray(rng.uniform(0.9, 1.2, 3))
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        site = 4
        ref = evolve_batch(hf, taus, basis, spec, correlation_site=site)
        tr, info = evolve_batch_auto(hf, taus, basis, spec, chi_start=4,
                                     chunk_periods=3, correlation_site=site)
        assert info["chi_pad_used"] > 4          # staging exercised
        assert tr["zz_corr"].shape == (3, spec.n_periods + 1, spec.L)
        np.testing.assert_allclose(tr["zz_corr"], np.asarray(ref["zz_corr"]),
                                   atol=1e-9)
        for k in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(tr[k], np.asarray(ref[k]), atol=1e-9)

    def test_batch_auto_correlation_site_checkpoint_resume(self, tmp_path):
        """zz_corr survives the staged checkpoint layout: a run killed
        after its first completed chunk resumes to traces identical to a
        straight-through run."""
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto
        from timecrystal_tpu.utils import checkpoint as ck_mod

        spec = _spec(L=8, chi=16, n=6, theta=0.9 * float(np.pi))
        rng = np.random.default_rng(7)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (2, spec.L)))
        taus = jnp.asarray([1.0, 1.1])
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        site = 3
        straight, _ = evolve_batch_auto(hf, taus, basis, spec, chi_start=4,
                                        chunk_periods=2,
                                        correlation_site=site)
        ckdir = str(tmp_path / "ck")
        orig = ck_mod.save_state
        calls = []

        def dying_save(*a, **kw):
            out = orig(*a, **kw)
            calls.append(1)
            if len(calls) == 1:
                raise KeyboardInterrupt("injected kill after first chunk")
            return out

        ck_mod.save_state = dying_save
        try:
            with np.testing.assert_raises(KeyboardInterrupt):
                evolve_batch_auto(hf, taus, basis, spec, chi_start=4,
                                  chunk_periods=2, correlation_site=site,
                                  checkpoint_dir=ckdir)
        finally:
            ck_mod.save_state = orig
        resumed, _ = evolve_batch_auto(hf, taus, basis, spec, chi_start=4,
                                       chunk_periods=2,
                                       correlation_site=site,
                                       checkpoint_dir=ckdir)
        for k in ("zz_corr", "sz_sites", "loschmidt_echo"):
            np.testing.assert_allclose(resumed[k], straight[k], atol=1e-12,
                                       err_msg=k)

    def test_batch_auto_sharded_matches_unsharded(self):
        """Chi-staged ensemble over the 8-device mesh == unsharded staged
        run (SPMD partitioning and mesh padding are numerically no-ops);
        R=11 exercises the pad-to-mesh-multiple path."""
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        assert len(jax.devices()) >= 8
        spec = _spec(L=8, chi=16, n=6, theta=0.9 * float(np.pi))
        R = 11
        rng = np.random.default_rng(9)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (R, spec.L)))
        taus = jnp.asarray(rng.uniform(0.9, 1.3, R))
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        ref, _ = evolve_batch_auto(hf, taus, basis, spec, chi_start=4,
                                   chunk_periods=2)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("batch",))
        out, info = evolve_batch_auto(hf, taus, basis, spec, chi_start=4,
                                      chunk_periods=2, mesh=mesh)
        assert out["sz_sites"].shape[0] == R
        for k in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(out[k], ref[k], rtol=0, atol=1e-12)

    def test_batch_auto_merged_frame(self):
        """Merged-frame staged ensemble: sz/LE traces match the strict
        fixed-chi batch (the half-step frame is observable-exact)."""
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        spec = _spec(L=8, chi=16, n=6, theta=0.9 * float(np.pi))
        rng = np.random.default_rng(7)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (2, spec.L)))
        taus = jnp.asarray([1.0, 1.15])
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        ref = evolve_batch(hf, taus, basis, spec)
        tr, _ = evolve_batch_auto(hf, taus, basis,
                                  spec._replace(frame="merged"),
                                  chi_start=4, chunk_periods=2)
        np.testing.assert_allclose(tr["sz_sites"], np.asarray(ref["sz_sites"]),
                                   atol=1e-9)
        np.testing.assert_allclose(tr["loschmidt_echo"],
                                   np.asarray(ref["loschmidt_echo"]),
                                   atol=1e-9)

    def test_batch_auto_cap_svd_method(self):
        """cap_svd_method='jacobi_proj' on the batched staged driver:
        cap-chi chunks route through the projected fast path (counted via
        the module hook), and with the cap at the system's full rank
        (L=6 -> mid-bond rank 8 == spec.chi) the traces match the default
        staged run at f64 exactness."""
        from timecrystal_tpu.ops.pallas import jacobi_svd as jsvd_mod
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        spec = _spec(L=6, chi=8, n=8, theta=0.85 * float(np.pi))
        rng = np.random.default_rng(5)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (2, spec.L)))
        taus = jnp.asarray([1.1, 1.2])
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        ref, info_ref = evolve_batch_auto(hf, taus, basis, spec,
                                          chi_start=4, chunk_periods=2)
        assert info_ref["chi_pad_used"] == 8     # ladder reaches the cap

        calls: list = []
        orig = jsvd_mod.jacobi_proj

        def counting(theta, k, **kw):
            calls.append(int(k))
            return orig(theta, k, **kw)

        jsvd_mod.jacobi_proj = counting
        jax.clear_caches()   # force retrace so the hook is captured
        try:
            tr, info = evolve_batch_auto(hf, taus, basis, spec,
                                         chi_start=4, chunk_periods=2,
                                         cap_svd_method="jacobi_proj")
        finally:
            jsvd_mod.jacobi_proj = orig
        assert info["chi_pad_used"] == 8
        assert calls and all(k == 8 for k in calls)
        for key in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(tr[key], ref[key], atol=1e-8)

    def test_batch_auto_projected_svd_guarded_below_cap(self):
        """spec.tp.svd_method='jacobi_core' on the batched staged driver:
        below-cap chunks override to the bit-faithful kernel (the module
        hook sees ONLY cap-chi calls) and the chi schedule matches the
        default run -- the projected path's noise-floor trunc_err can no
        longer poison escalation (round-4 VERDICT weak #2, batched leg)."""
        from timecrystal_tpu.ops.pallas import jacobi_svd as jsvd_mod
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        spec = _spec(L=6, chi=8, n=8, theta=0.85 * float(np.pi))
        rng = np.random.default_rng(5)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (2, spec.L)))
        taus = jnp.asarray([1.1, 1.2])
        basis = jnp.asarray(_basis_indices(spec.L, "neel"))
        ref, info_ref = evolve_batch_auto(hf, taus, basis, spec,
                                          chi_start=4, chunk_periods=2)
        assert info_ref["chi_pad_used"] == 8

        calls: list = []
        orig = jsvd_mod.jacobi_core

        def counting(theta, k, **kw):
            calls.append(int(k))
            return orig(theta, k, **kw)

        jsvd_mod.jacobi_core = counting
        jax.clear_caches()
        try:
            spec_p = spec._replace(
                tp=spec.tp._replace(svd_method="jacobi_core"))
            tr, info = evolve_batch_auto(hf, taus, basis, spec_p,
                                         chi_start=4, chunk_periods=2)
        finally:
            jsvd_mod.jacobi_core = orig
        assert info["chi_escalations"] == info_ref["chi_escalations"]
        assert info["chi_pad_used"] == 8
        assert calls and all(k == 8 for k in calls)
        for key in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(tr[key], ref[key], atol=1e-8)

    def test_disorder_ensemble_shapes(self):
        spec = _spec(n=3)
        tr = disorder_ensemble(jax.random.PRNGKey(5), 6, spec,
                               h_disorder=0.3, tau=1.0)
        assert np.asarray(tr["sz_sites"]).shape == (6, 4, spec.L)
        assert np.asarray(tr["staggered_magnetization"]).shape == (6, 4)

    def test_disorder_ensemble_staged_matches(self):
        """staged=True routes through evolve_batch_auto with the same trace
        contract and identical observables."""
        spec = _spec(L=8, chi=16, n=6, theta=0.9 * float(np.pi))
        ref = disorder_ensemble(jax.random.PRNGKey(5), 3, spec,
                                h_disorder=0.3, tau=1.0)
        tr = disorder_ensemble(jax.random.PRNGKey(5), 3, spec,
                               h_disorder=0.3, tau=1.0, staged=True,
                               chi_start=4, chunk_periods=2)
        assert set(tr) == set(ref)
        for k in ("sz_sites", "loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(tr[k], np.asarray(ref[k]), atol=1e-9)


class TestPhaseGrid:
    def test_reference_rng_semantics(self):
        """Per-point disorder = h * SAME base pattern (reference re-seeds
        np.random per point, main.py:318-324 + kicked_ising.py:55-59)."""
        spec = _spec()
        h_fields, taus, hs, Ts = phase_grid_batch([0.0, 0.2, 0.4], [2.0, 3.0],
                                                  spec, disorder_seed=42)
        h_fields = np.asarray(h_fields)
        np.random.seed(42)
        base = np.random.uniform(-1.0, 1.0, spec.L)
        # row with h=0.4, any T: fields = 0.4 * base
        idx = np.argwhere(np.isclose(hs, 0.4))[:, 0]
        for i in idx:
            np.testing.assert_allclose(h_fields[i], 0.4 * base, atol=1e-12)
        # h=0 row: exactly zero fields (clean system)
        idx0 = np.argwhere(np.isclose(hs, 0.0))[:, 0]
        np.testing.assert_allclose(h_fields[idx0], 0.0, atol=0)
        # tau = T_J / (2 J)
        np.testing.assert_allclose(np.asarray(taus), Ts / 2.0, atol=1e-12)

    def test_matches_reference_model_disorder(self):
        """phase_grid_batch fields == KickedIsingModel(seed) fields."""
        spec = _spec()
        h_over_J = 0.35
        h_fields, _, _, _ = phase_grid_batch([h_over_J], [2.0], spec,
                                             disorder_seed=42)
        m = KickedIsingModel(spec.L, 1.0, h_over_J, 1.0, disorder_seed=42)
        np.testing.assert_allclose(np.asarray(h_fields)[0], m.h_fields,
                                   atol=1e-12)


class TestSiteSharding:
    """Site-axis MPS sharding (sequence-parallel analog, SURVEY section 5):
    sharded evolution must match the single-device path exactly."""

    def _setup(self, L=16, chi=16, theta=0.92 * np.pi):
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)
        hf = draw_disorder_reference(L, 0.3, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float64), 0.9,
                                   theta=theta, dtype=jnp.float64)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=jnp.float64)
        tp = TruncParams(chi_max=0, svd_min=1e-14, svd_method="native")
        return psi0, gates, tp

    def test_sharded_matches_single_device(self):
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
        from timecrystal_tpu.parallel.site_shard import (
            evolve_floquet_sharded, site_mesh)
        psi0, gates, tp = self._setup()
        mesh = site_mesh(8)
        for frame in ("strict", "merged"):
            (Bf, lamf), tr = evolve_floquet_sharded(psi0, gates, 8, tp,
                                                    mesh, frame=frame)
            _, ref = evolve_floquet_scan(psi0, gates, 8, tp, frame=frame)
            np.testing.assert_allclose(np.asarray(tr["sz_sites"]),
                                       np.asarray(ref["sz_sites"]),
                                       atol=1e-13)
            np.testing.assert_allclose(np.asarray(tr["loschmidt_echo"]),
                                       np.asarray(ref["loschmidt_echo"]),
                                       atol=1e-13)
            np.testing.assert_allclose(np.asarray(tr["trunc_err"]),
                                       np.asarray(ref["trunc_err"]),
                                       atol=1e-15)

    def test_sharded_final_state_matches(self):
        """BOTH frames: the returned state must be the PHYSICAL final
        state (merged frame exits via the inverse half-step, exactly like
        evolve_floquet_scan -- it used to come back frame-shifted)."""
        from timecrystal_tpu.core.mps import MPS, overlap
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
        from timecrystal_tpu.ops import cpx
        from timecrystal_tpu.parallel.site_shard import (
            evolve_floquet_sharded, site_mesh)
        psi0, gates, tp = self._setup()
        for frame in ("strict", "merged"):
            (Bf, lamf), tr = evolve_floquet_sharded(psi0, gates, 6, tp,
                                                    site_mesh(8),
                                                    frame=frame)
            ref_final, ref_tr = evolve_floquet_scan(psi0, gates, 6, tp,
                                                    frame=frame)
            pad = jnp.zeros((1, lamf.shape[1]), lamf.dtype)
            psi_sh = MPS(B=Bf, lam=jnp.concatenate(
                [np.asarray(lamf), pad], axis=0))
            ov = float(cpx.abs2(overlap(ref_final, psi_sh)))
            np.testing.assert_allclose(ov, 1.0, atol=1e-12, err_msg=frame)
            # frame-entry/exit truncation surfaced like the unsharded path
            assert "trunc_err_boundary" in tr
            np.testing.assert_allclose(
                float(tr["trunc_err_boundary"]),
                float(np.asarray(ref_tr["trunc_err_boundary"])), atol=1e-13)

    def test_rejects_unknown_frame(self):
        from timecrystal_tpu.parallel.site_shard import (
            evolve_floquet_sharded, site_mesh)
        import pytest
        psi0, gates, tp = self._setup()
        with pytest.raises(ValueError, match="unknown frame"):
            evolve_floquet_sharded(psi0, gates, 2, tp, site_mesh(8),
                                   frame="Merged")

    def test_rejects_periodic_bc(self):
        """A periodic gate set must be rejected, not silently evolved as
        an open chain (the wrap bond never rides the shard_map ring)."""
        import pytest

        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)
        from timecrystal_tpu.parallel.site_shard import (
            evolve_floquet_sharded, site_mesh)
        L = 16
        hf = draw_disorder_reference(L, 0.3, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float64), 0.9,
                                   theta=0.92 * np.pi, dtype=jnp.float64,
                                   bc="periodic")
        psi0 = create_initial_state(L, "neel", chi=16, dtype=jnp.float64)
        tp = TruncParams(chi_max=0, svd_min=1e-14, svd_method="native")
        with pytest.raises(NotImplementedError, match="periodic"):
            evolve_floquet_sharded(psi0, gates, 2, tp, site_mesh(8))

    def test_rejects_bad_split(self):
        import pytest

        from timecrystal_tpu.parallel.site_shard import (
            evolve_floquet_sharded, site_mesh)
        psi0, gates, tp = self._setup(L=12)   # 12/8 not integral
        with pytest.raises(ValueError):
            evolve_floquet_sharded(psi0, gates, 2, tp, site_mesh(8))


class TestEnsembleCorrelationTraces:
    def test_batch_zz_corr_matches_single_and_sharded(self):
        """evolve_batch(correlation_site=i): per-realization zz_corr equals
        the single-chain CustomFloquet trace, and the mesh-sharded path
        equals the unsharded one (incl. the t=0 row)."""
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.dynamics.tebd import CustomFloquet
        from timecrystal_tpu.parallel.sweep import default_mesh

        spec = _spec(L=8, chi=16, n=5)
        site = 4
        hf = np.stack([np.random.RandomState(s).uniform(-0.3, 0.3, spec.L)
                       for s in (1, 2, 3)])
        taus = jnp.asarray([1.0, 1.2, 0.9])
        basis = _basis_indices(spec.L, "neel")
        tr = evolve_batch(jnp.asarray(hf), taus, jnp.asarray(basis), spec,
                          correlation_site=site)
        assert tr["zz_corr"].shape == (3, spec.n_periods + 1, spec.L)

        m = KickedIsingModel(spec.L, 1.0, 0.3, float(taus[1]),
                             h_fields=hf[1], chi=spec.chi,
                             theta=spec.theta, dtype=jnp.float64)
        psi0 = create_initial_state(spec.L, "neel", chi=spec.chi,
                                    dtype=jnp.float64)
        ref, _, _ = CustomFloquet(m, TP).evolve_floquet_traces(
            psi0, spec.n_periods, correlation_site=site)
        np.testing.assert_allclose(np.asarray(tr["zz_corr"][1]),
                                   ref["zz_corr"], atol=1e-12)

        sharded = evolve_batch_sharded(jnp.asarray(hf), taus, basis, spec,
                                       Mesh(np.asarray(jax.devices()),
                                            ("batch",)),
                                       correlation_site=site)
        np.testing.assert_allclose(np.asarray(sharded["zz_corr"]),
                                   np.asarray(tr["zz_corr"]), atol=1e-12)

    def test_batch_two_time_matches_single_and_sharded(self):
        """evolve_batch(two_time_anchor=i): per-realization zz2t traces
        equal the single-chain evolve_two_time_zz driver (rows after the
        prepended t=0 equal-time profile), sharded == unsharded."""
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.observables import zz_correlation_profile
        from timecrystal_tpu.dynamics.tebd import evolve_two_time_zz
        from timecrystal_tpu.models.kicked_ising import make_floquet_gates

        spec = _spec(L=8, chi=16, n=5)
        anchor = 3
        hf = np.stack([np.random.RandomState(s).uniform(-0.3, 0.3, spec.L)
                       for s in (1, 2, 3)])
        taus = jnp.asarray([1.0, 1.2, 0.9])
        basis = _basis_indices(spec.L, "neel")
        tr = evolve_batch(jnp.asarray(hf), taus, jnp.asarray(basis), spec,
                          two_time_anchor=anchor)
        assert tr["zz2t_re"].shape == (3, spec.n_periods + 1, spec.L)

        psi0 = create_initial_state(spec.L, "neel", chi=spec.chi,
                                    dtype=jnp.float64)
        gates = make_floquet_gates(1.0, jnp.asarray(hf[1], jnp.float64),
                                   float(taus[1]), theta=spec.theta,
                                   dtype=jnp.float64)
        _, ref = evolve_two_time_zz(psi0, gates, spec.n_periods, TP,
                                    anchor=anchor)
        np.testing.assert_allclose(np.asarray(tr["zz2t_re"][1][1:]),
                                   np.asarray(ref["zz2t_re"]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(tr["zz2t_im"][1][1:]),
                                   np.asarray(ref["zz2t_im"]), atol=1e-12)
        # t=0 row: the equal-time profile, imaginary part exactly zero
        np.testing.assert_allclose(
            np.asarray(tr["zz2t_re"][1][0]),
            np.asarray(zz_correlation_profile(psi0, anchor)), atol=1e-14)
        assert np.all(np.asarray(tr["zz2t_im"][:, 0]) == 0.0)

        sharded = evolve_batch_sharded(jnp.asarray(hf), taus, basis, spec,
                                       Mesh(np.asarray(jax.devices()),
                                            ("batch",)),
                                       two_time_anchor=anchor)
        np.testing.assert_allclose(np.asarray(sharded["zz2t_re"]),
                                   np.asarray(tr["zz2t_re"]), atol=1e-12)

    def test_staged_correlation_site_via_disorder_ensemble(self):
        """correlation_site now WORKS on the chi-staged ensemble path
        (round-4 VERDICT seam, closed round 5: it used to raise
        NotImplementedError here) -- staged and fixed-chi zz_corr agree."""
        from timecrystal_tpu.parallel.sweep import disorder_ensemble

        spec = _spec(L=8, chi=16, n=4)
        key = jax.random.PRNGKey(0)
        ref = disorder_ensemble(key, 2, spec, 0.3, 1.0, correlation_site=3)
        tr = disorder_ensemble(key, 2, spec, 0.3, 1.0, staged=True,
                               chi_start=4, chunk_periods=2,
                               correlation_site=3)
        assert tr["zz_corr"].shape == (2, 5, spec.L)
        np.testing.assert_allclose(tr["zz_corr"], np.asarray(ref["zz_corr"]),
                                   atol=1e-9)


class TestDriveStrengthAxis:
    """Per-realization kick angle (the drive-strength sweep axis the
    reference abstract advertises but never implements)."""

    def test_theta_batch_matches_scalar(self):
        """evolve_batch(thetas=...) element == scalar-theta spec run."""
        L = 8
        thetas = [0.92 * np.pi, np.pi]   # one generic, one exact-pi
        hf = np.stack([np.random.RandomState(s).uniform(-0.3, 0.3, L)
                       for s in (1, 2)])
        taus = jnp.asarray([1.0, 1.2])
        basis = jnp.asarray(_basis_indices(L, "neel"))
        spec = _spec(L=L, n=5)
        tr = evolve_batch(jnp.asarray(hf), taus, basis, spec,
                          thetas=jnp.asarray(thetas))
        for k, th in enumerate(thetas):
            ref = evolve_batch(jnp.asarray(hf[k:k + 1]), taus[k:k + 1],
                               basis, spec._replace(theta=float(th)))
            for key in ("sz_sites", "loschmidt_echo", "entropy_mid"):
                np.testing.assert_allclose(np.asarray(tr[key])[k],
                                           np.asarray(ref[key])[0],
                                           atol=1e-12)

    def test_theta_batch_sharded_matches_unsharded(self):
        spec = _spec(L=8, n=4)
        R = 5   # not a mesh multiple (exercises theta padding)
        rng = np.random.default_rng(3)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (R, spec.L)))
        taus = jnp.full((R,), 1.0)
        thetas = jnp.asarray(np.pi * (1.0 - np.linspace(0.0, 0.2, R)))
        basis = _basis_indices(spec.L, "neel")
        a = evolve_batch(hf, taus, jnp.asarray(basis), spec, thetas=thetas)
        b = evolve_batch_sharded(hf, taus, basis, spec,
                                 Mesh(np.asarray(jax.devices()), ("batch",)),
                                 thetas=thetas)
        for key in ("sz_sites", "loschmidt_echo"):
            np.testing.assert_allclose(np.asarray(b[key]),
                                       np.asarray(a[key]), atol=1e-12)

    def test_drive_grid_melts_with_eps(self):
        """A2T ~ 1 at eps=0 and decays once eps leaves the DTC plateau."""
        from timecrystal_tpu.analysis.phase_diagram import sweep_drive_grid

        params = {"J": 1.0, "T_DRIVE": 2.0, "RANDOM_SEED": 42,
                  "SVD_MIN": 1e-12, "SVD_CUTOFF": 1e-7}
        res = sweep_drive_grid([0.0, 0.45], [0.0, 0.3], params,
                               n_sites=8, n_periods=32, chi_pad=16)
        A2T = res["A2T"]
        assert A2T.shape == (2, 2)
        assert all(r["success"] for r in res["records"])
        # exact pi pulse: perfect period doubling at any disorder
        assert A2T[0, 0] > 0.8 and A2T[0, 1] > 0.8
        # far off the plateau the disordered chain's subharmonic response
        # collapses (the clean h=0 column keeps a finite-size coherent
        # revival at any eps, so the melting signature lives at h>0)
        assert A2T[1, 1] < 0.5 * A2T[0, 1]

    def test_drive_grid_chunked_matches_one_program(self):
        """chunk_size (the axon worker-limit guard) never changes results:
        chunked evolution with a ragged padded tail == one batched program."""
        from timecrystal_tpu.analysis.phase_diagram import sweep_drive_grid

        params = {"J": 1.0, "T_DRIVE": 2.0, "RANDOM_SEED": 42,
                  "SVD_MIN": 1e-12, "SVD_CUTOFF": 1e-7}
        kw = dict(n_sites=8, n_periods=10, chi_pad=16)
        eps, hs = [0.0, 0.1, 0.3], [0.0, 0.4, 0.8]
        one = sweep_drive_grid(eps, hs, params, chunk_size=0, **kw)
        chunked = sweep_drive_grid(eps, hs, params, chunk_size=4, **kw)
        np.testing.assert_allclose(chunked["A2T"], one["A2T"], atol=1e-12)
        for key in ("sz_sites", "loschmidt_echo"):
            np.testing.assert_allclose(chunked["traces"][key],
                                       one["traces"][key], atol=1e-12)

    def test_negative_chunk_size_raises(self):
        """A negative chunk_size must fail loudly, not crash with an
        IndexError from an empty range (advisor round 3)."""
        import pytest

        from timecrystal_tpu.analysis.phase_diagram import (sweep_drive_grid,
                                                            sweep_phase_grid)

        params = {"J": 1.0, "T_DRIVE": 2.0, "RANDOM_SEED": 42}
        with pytest.raises(ValueError, match="chunk_size"):
            sweep_drive_grid([0.0], [0.0], params, n_sites=6, n_periods=2,
                             chi_pad=8, chunk_size=-3)
        with pytest.raises(ValueError, match="chunk_size"):
            sweep_phase_grid([0.1], [2.0], params, chunk_size=-3,
                             checkpoint_dir="/tmp/never-used")

    def test_grid_svd_method_resolved_from_full_batch(self):
        """Chunked and single-program sweeps must resolve svd_method='auto'
        from the FULL grid size, so chunking cannot change which SVD kernel
        runs on TPU (advisor round 3).  Verified by resolving at both sizes
        and asserting the grid-level resolution is what both paths see."""
        import jax

        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.parallel.sweep import (SweepSpec,
                                                    _resolve_svd_method)

        tp = TruncParams(chi_max=24, svd_min=1e-12, trunc_cut=1e-7)
        spec = SweepSpec(L=16, chi=32, n_periods=80, J=1.0,
                         theta=float(np.pi), tp=tp)
        full = _resolve_svd_method(spec, 120)
        # idempotent: a chunk re-resolving an already-resolved spec is a
        # no-op regardless of its (smaller) batch size
        assert _resolve_svd_method(full, 4) == full
        if jax.default_backend() == "cpu":
            assert full.tp.svd_method == "auto"   # resolution is TPU-only

    def test_auto_rule_entangling_routes_jacobi(self, monkeypatch):
        """The TPU auto rule keeps gram_eigh ONLY for the exact-pi
        (rank-1) phase-grid class: entangling sweeps (thetas axis or
        spec.theta != pi) and n >= 96 route to jacobi -- the worker's
        batched-eigh fault on rank-dense data is data-dependent
        (baselines/gram_eigh_fault_probe.py)."""
        import timecrystal_tpu.parallel.sweep as sw
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.parallel.sweep import (SweepSpec,
                                                    _resolve_svd_method)

        monkeypatch.setattr(sw.jax, "default_backend", lambda: "tpu")
        tp = TruncParams(chi_max=24, svd_min=1e-12)
        spec = SweepSpec(L=16, chi=32, n_periods=80, J=1.0,
                         theta=float(np.pi), tp=tp)
        # reference phase-grid class: exact pi, n=64, large batch -> gram
        assert _resolve_svd_method(spec, 120).tp.svd_method == "gram_eigh"
        # per-realization thetas axis (drive grid) -> jacobi
        assert _resolve_svd_method(spec, 120, entangling=True) \
            .tp.svd_method == "jacobi"
        # static imperfect pulse -> jacobi
        spec2 = spec._replace(theta=0.9 * float(np.pi))
        assert _resolve_svd_method(spec2, 120).tp.svd_method == "jacobi"
        # n >= 96 -> jacobi at any batch even at exact pi
        spec3 = spec._replace(chi=48)
        assert _resolve_svd_method(spec3, 120).tp.svd_method == "jacobi"
