"""utils tier: checkpoint/resume and profiling hooks."""

import os

import jax.numpy as jnp
import numpy as np

from timecrystal_tpu.core.mps import create_initial_state, overlap
from timecrystal_tpu.ops import cpx
from timecrystal_tpu.utils.checkpoint import (SweepCheckpointer, load_state,
                                              save_state)
from timecrystal_tpu.utils.profiling import PhaseTimer, timed_blocked


class TestCheckpoint:
    def test_state_roundtrip(self, tmp_path):
        psi = create_initial_state(8, "neel", chi=16, dtype=jnp.float64)
        meta = {"period": 42, "h_fields": [0.1, -0.2], "seed": 7}
        path = str(tmp_path / "state.npz")
        save_state(path, psi, meta)
        psi2, meta2 = load_state(path)
        assert meta2 == meta
        ov = overlap(psi, psi2)
        assert abs(float(cpx.abs2(ov)) - 1.0) < 1e-12
        np.testing.assert_array_equal(np.asarray(psi.lam), np.asarray(psi2.lam))

    def test_evolved_state_roundtrip(self, tmp_path):
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.models.kicked_ising import KickedIsingModel
        m = KickedIsingModel(6, 1.0, 0.3, 1.0, disorder_seed=3, chi=16,
                             theta=0.9 * np.pi, dtype=jnp.float64)
        psi = create_initial_state(6, "neel", chi=16, dtype=jnp.float64)
        for _ in range(3):
            psi = m.floquet_step(psi, TruncParams(svd_min=1e-12))
        path = str(tmp_path / "evolved")
        save_state(path, psi, {"period": 3})
        psi2, meta = load_state(path)
        assert meta["period"] == 3
        # resumed evolution == continuous evolution
        a = m.floquet_step(psi, TruncParams(svd_min=1e-12))
        b = m.floquet_step(psi2, TruncParams(svd_min=1e-12))
        assert abs(float(cpx.abs2(overlap(a, b))) - 1.0) < 1e-10

    def test_sweep_checkpointer_resume(self, tmp_path):
        ck = SweepCheckpointer(str(tmp_path / "sweep"))
        assert ck.completed_chunks() == set()
        ck.save_chunk(0, {"le": np.arange(5.0)}, extra={"grid": "h x T"})
        ck.save_chunk(2, {"le": np.arange(5.0) * 2})
        assert ck.completed_chunks() == {0, 2}
        out = ck.load_chunk(2)
        np.testing.assert_allclose(out["le"], np.arange(5.0) * 2)
        # a fresh instance sees the same manifest (resume after crash)
        ck2 = SweepCheckpointer(str(tmp_path / "sweep"))
        assert ck2.completed_chunks() == {0, 2}


class TestProfiling:
    def test_phase_timer(self):
        import time
        with PhaseTimer() as t:
            with t.phase("a"):
                time.sleep(0.01)
            with t.phase("a"):
                time.sleep(0.01)
            with t.phase("b"):
                pass
        rep = t.report()
        assert rep["a"] >= 0.02
        assert "b" in rep

    def test_timed_blocked(self):
        x = jnp.ones((128, 128))
        out, secs = timed_blocked(lambda a: a @ a, x)
        assert secs >= 0.0
        assert out.shape == (128, 128)


class TestCheckpointIntegration:
    """Kill-and-resume behavior of the wired-in checkpoint paths
    (VERDICT round-1: SweepCheckpointer must be used by a driver, and
    chi-escalation must resume rather than restart)."""

    def test_sweep_phase_grid_kill_and_resume(self, tmp_path, monkeypatch):
        from timecrystal_tpu.analysis import phase_diagram as pd

        params = {"J": 1.0, "SVD_MIN": 1e-12, "SVD_CUTOFF": 1e-7,
                  "RANDOM_SEED": 42}
        hv, Tv = [0.0, 0.2, 0.4], [1.6, 2.0]   # 6 points
        monkeypatch.setattr(pd, "GRID_HARDCODED",
                            dict(pd.GRID_HARDCODED, n_sites=6, n_periods=4))
        ref = pd.sweep_phase_grid(hv, Tv, params)

        ckdir = str(tmp_path / "sweep_ck")
        calls = {"n": 0}
        orig = pd.evolve_batch

        def counting(h, t, basis, spec):
            calls["n"] += 1
            if calls["n"] == 2:
                raise KeyboardInterrupt("simulated kill mid-sweep")
            return orig(h, t, basis, spec)

        monkeypatch.setattr(pd, "evolve_batch", counting)
        try:
            pd.sweep_phase_grid(hv, Tv, params, checkpoint_dir=ckdir,
                                chunk_size=2)
        except KeyboardInterrupt:
            pass
        assert calls["n"] == 2  # chunk 0 completed, chunk 1 killed

        monkeypatch.setattr(pd, "evolve_batch", orig)
        res = pd.sweep_phase_grid(hv, Tv, params, checkpoint_dir=ckdir,
                                  chunk_size=2)
        from timecrystal_tpu.utils.checkpoint import SweepCheckpointer
        assert SweepCheckpointer(ckdir).completed_chunks() == {0, 1, 2}
        np.testing.assert_allclose(res["traces"]["loschmidt_echo"],
                                   ref["traces"]["loschmidt_echo"],
                                   rtol=0, atol=1e-12)

    def test_evolve_floquet_auto_escalates_and_resumes(self, tmp_path):
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_auto

        mk = dict(n_sites=8, J=1.0, h_disorder=0.3, tau=0.9,
                  disorder_seed=42, theta=0.92 * np.pi, dtype="float64")
        tp = TruncParams(chi_max=0, svd_min=1e-12, svd_method="native")
        # chi_start=8 saturates only after a few periods -> the escalation
        # happens in a LATER chunk, and only that chunk may re-run
        tr, times, info, model = evolve_floquet_auto(
            mk, "neel", 10, tp, chi_start=8, chi_limit=16, chunk_periods=2)
        assert info["chi_pad_used"] == 16
        assert info["chi_escalations"], "expected at least one escalation"
        assert any(e["period"] > 0 for e in info["chi_escalations"]), \
            "test config should escalate after the first chunk"
        # resume-from-padded-state: re-run cost is one chunk per escalation,
        # never the whole prefix (the old behavior restarted from t=0)
        assert info["n_rerun_periods"] <= 2 * len(info["chi_escalations"])

        ckdir = str(tmp_path / "auto_ck")
        tr_half, _, _, _ = evolve_floquet_auto(
            mk, "neel", 6, tp, chi_start=8, chi_limit=16, chunk_periods=2,
            checkpoint_dir=ckdir)
        tr_full, _, info_r, _ = evolve_floquet_auto(
            mk, "neel", 10, tp, chi_start=8, chi_limit=16, chunk_periods=2,
            checkpoint_dir=ckdir)
        np.testing.assert_allclose(tr_full["loschmidt_echo"],
                                   tr["loschmidt_echo"], rtol=0, atol=1e-12)

    def test_evolve_floquet_auto_rejects_mismatched_resume(self, tmp_path):
        """A resume with a changed Hamiltonian/state/ladder must refuse
        (same fingerprint guard as evolve_batch_auto): a shape-compatible
        checkpoint of a different run would silently continue the wrong
        evolution."""
        import pytest

        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_auto

        mk = dict(n_sites=8, J=1.0, h_disorder=0.3, tau=0.9,
                  disorder_seed=42, theta=0.92 * np.pi, dtype="float64")
        tp = TruncParams(chi_max=0, svd_min=1e-12, svd_method="native")
        ckdir = str(tmp_path / "fp_ck")
        evolve_floquet_auto(mk, "neel", 4, tp, chi_start=8, chi_limit=16,
                            chunk_periods=2, checkpoint_dir=ckdir)
        bad = dict(mk, tau=1.1)
        with pytest.raises(ValueError, match="different parameters"):
            evolve_floquet_auto(bad, "neel", 8, tp, chi_start=8,
                                chi_limit=16, chunk_periods=2,
                                checkpoint_dir=ckdir)
        with pytest.raises(ValueError, match="different parameters"):
            evolve_floquet_auto(mk, "all_up", 8, tp, chi_start=8,
                                chi_limit=16, chunk_periods=2,
                                checkpoint_dir=ckdir)
        # unchanged parameters with a longer horizon still resume fine
        tr, _, _, _ = evolve_floquet_auto(mk, "neel", 8, tp, chi_start=8,
                                          chi_limit=16, chunk_periods=2,
                                          checkpoint_dir=ckdir)
        assert tr["loschmidt_echo"].shape[0] == 9

    def test_evolve_floquet_auto_chi_start_clamped_to_cap(self):
        """chi_start above tp.chi_max must clamp (was padded at chi_start
        with escalation permanently disabled and 8x wasted work)."""
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_auto

        mk = dict(n_sites=6, J=1.0, h_disorder=0.3, tau=0.9,
                  disorder_seed=7, theta=0.92 * np.pi, dtype="float64")
        tp = TruncParams(chi_max=8, svd_min=1e-12, svd_method="native")
        _, _, info, _ = evolve_floquet_auto(mk, "neel", 4, tp,
                                            chi_start=32, chi_limit=64,
                                            chunk_periods=2)
        assert info["chi_pad_used"] <= 8

    def test_evolve_batch_auto_resume_shorter_n_periods(self, tmp_path):
        """Resuming with a SMALLER n_periods than the checkpoint holds must
        still return the contracted [R, n_periods+1] traces."""
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.parallel.sweep import (SweepSpec, _basis_indices,
                                                    evolve_batch_auto)

        tp = TruncParams(chi_max=0, svd_min=1e-12, svd_method="native")
        rng = np.random.default_rng(5)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 8)))
        taus = jnp.asarray([0.9, 1.05])
        basis = jnp.asarray(_basis_indices(8, "neel"))
        spec = SweepSpec(L=8, chi=16, n_periods=8, theta=0.92 * np.pi,
                         tp=tp, dtype="float64")
        ckdir = str(tmp_path / "short_ck")
        full, _ = evolve_batch_auto(hf, taus, basis, spec, chi_start=8,
                                    chunk_periods=2, checkpoint_dir=ckdir)
        short, _ = evolve_batch_auto(hf, taus, basis,
                                     spec._replace(n_periods=4),
                                     chi_start=8, chunk_periods=2,
                                     checkpoint_dir=ckdir)
        assert short["loschmidt_echo"].shape == (2, 5)
        np.testing.assert_allclose(short["loschmidt_echo"],
                                   full["loschmidt_echo"][:, :5],
                                   atol=1e-12)

    def test_evolve_batch_auto_kill_and_resume(self, tmp_path):
        """Batched staged ensemble resumes from the last completed chunk:
        a partial run (6 of 10 periods) followed by a full run through the
        same checkpoint_dir reproduces the uncheckpointed traces."""
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.parallel.sweep import (SweepSpec, _basis_indices,
                                                    evolve_batch_auto)

        tp = TruncParams(chi_max=0, svd_min=1e-12, svd_method="native")
        rng = np.random.default_rng(5)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 8)))
        taus = jnp.asarray([0.9, 1.05])
        basis = jnp.asarray(_basis_indices(8, "neel"))

        def spec(n):
            return SweepSpec(L=8, chi=16, n_periods=n,
                             theta=0.92 * float(np.pi), tp=tp,
                             dtype="float64")

        ref, info = evolve_batch_auto(hf, taus, basis, spec(10),
                                      chi_start=8, chunk_periods=2)
        assert info["chi_pad_used"] == 16

        ckdir = str(tmp_path / "batch_ck")
        evolve_batch_auto(hf, taus, basis, spec(6), chi_start=8,
                          chunk_periods=2, checkpoint_dir=ckdir)
        full, _ = evolve_batch_auto(hf, taus, basis, spec(10), chi_start=8,
                                    chunk_periods=2, checkpoint_dir=ckdir)
        np.testing.assert_allclose(full["loschmidt_echo"],
                                   ref["loschmidt_echo"], rtol=0, atol=1e-12)
        np.testing.assert_allclose(full["sz_sites"], ref["sz_sites"],
                                   rtol=0, atol=1e-12)

        # resume THROUGH a mesh: the loaded state re-shards and the
        # completed prefix is not re-evolved
        import jax
        from jax.sharding import Mesh

        ckdir2 = str(tmp_path / "batch_ck_mesh")
        mesh = Mesh(np.asarray(jax.devices()[:2]), ("batch",))
        evolve_batch_auto(hf, taus, basis, spec(6), chi_start=8,
                          chunk_periods=2, checkpoint_dir=ckdir2, mesh=mesh)
        full2, _ = evolve_batch_auto(hf, taus, basis, spec(10), chi_start=8,
                                     chunk_periods=2, checkpoint_dir=ckdir2,
                                     mesh=mesh)
        np.testing.assert_allclose(full2["loschmidt_echo"],
                                   ref["loschmidt_echo"], rtol=0, atol=1e-12)

    def test_evolve_batch_auto_legacy_traces_migration(self, tmp_path):
        """A pre-round-3 checkpoint (single batch_auto_traces.npz holding
        all chunks as k__i keys) still resumes, and the resume backfills
        the per-chunk layout so subsequent checkpoints stay O(1)."""
        import os

        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.parallel.sweep import (SweepSpec, _basis_indices,
                                                    evolve_batch_auto)

        tp = TruncParams(chi_max=0, svd_min=1e-12, svd_method="native")
        rng = np.random.default_rng(5)
        hf = jnp.asarray(rng.uniform(-0.3, 0.3, (2, 8)))
        taus = jnp.asarray([0.9, 1.05])
        basis = jnp.asarray(_basis_indices(8, "neel"))

        def spec(n):
            return SweepSpec(L=8, chi=16, n_periods=n,
                             theta=0.92 * float(np.pi), tp=tp,
                             dtype="float64")

        ref, _ = evolve_batch_auto(hf, taus, basis, spec(10),
                                   chi_start=8, chunk_periods=2)

        ckdir = tmp_path / "legacy_ck"
        evolve_batch_auto(hf, taus, basis, spec(6), chi_start=8,
                          chunk_periods=2, checkpoint_dir=str(ckdir))
        # convert the per-chunk layout into the legacy single-npz one
        chunk_dir = ckdir / "batch_auto_chunks"
        paths = sorted(chunk_dir.glob("chunk_*.npz"))
        assert len(paths) == 3
        flat = {}
        for i, p in enumerate(paths):
            with np.load(p) as z:
                for k in z.files:
                    flat[f"{k}__{i}"] = z[k]
            os.remove(p)
        os.rmdir(chunk_dir)
        np.savez_compressed(ckdir / "batch_auto_traces.npz", **flat)

        full, _ = evolve_batch_auto(hf, taus, basis, spec(10), chi_start=8,
                                    chunk_periods=2, checkpoint_dir=str(ckdir))
        np.testing.assert_allclose(full["loschmidt_echo"],
                                   ref["loschmidt_echo"], rtol=0, atol=1e-12)
        # backfilled + appended per-chunk files exist for all 5 chunks
        assert sorted(p.name for p in chunk_dir.glob("chunk_*.npz")) == [
            f"chunk_{i:05d}.npz" for i in range(5)]

    def test_orbax_state_roundtrip(self, tmp_path):
        from timecrystal_tpu.utils.checkpoint import (load_state, save_state,
                                                      state_exists)
        pytest = __import__("pytest")
        psi = create_initial_state(6, "neel", chi=8)
        path = str(tmp_path / "st")
        try:
            save_state(path, psi, {"k": 3}, format="orbax")
        except RuntimeError:
            pytest.skip("orbax not installed")
        assert state_exists(path)
        psi2, meta = load_state(path)
        assert meta == {"k": 3}
        np.testing.assert_array_equal(np.asarray(psi.B.re),
                                      np.asarray(psi2.B.re))

    def test_sweep_checkpointer_fingerprint_mismatch(self, tmp_path):
        """A manifest written under a different fingerprint must refuse to
        resume (misaligned chunks silently painted wrong grid points)."""
        import pytest

        from timecrystal_tpu.utils.checkpoint import SweepCheckpointer
        d = str(tmp_path / "sweep")
        ck = SweepCheckpointer(d, fingerprint="AAA")
        ck.save_chunk(0, {"x": np.arange(3.0)})
        assert SweepCheckpointer(d, fingerprint="AAA").completed_chunks() == {0}
        with pytest.raises(ValueError, match="different parameters"):
            SweepCheckpointer(d, fingerprint="BBB").completed_chunks()

    def test_sweep_checkpointer_survives_truncated_manifest(self, tmp_path):
        """The manifest is installed atomically; simulate the OLD failure
        (partial write) and confirm a fresh save path never produces it:
        after save_chunk, the manifest always parses."""
        import json

        from timecrystal_tpu.utils.checkpoint import SweepCheckpointer
        d = str(tmp_path / "sweep2")
        ck = SweepCheckpointer(d)
        for i in range(5):
            ck.save_chunk(i, {"x": np.arange(4.0)})
            with open(ck.manifest_path) as f:
                assert set(json.load(f)["chunks"]) == set(range(i + 1))

    def test_npz_not_shadowed_by_stale_orbax(self, tmp_path):
        """When both formats exist at one path, the NEWER wins: a stale
        .orbax dir used to shadow a newer npz (silently restoring old
        state, or refusing to resume when orbax broke)."""
        import time as _t

        from timecrystal_tpu.utils.checkpoint import load_state, save_state
        pytest = __import__("pytest")
        psi_a = create_initial_state(6, "neel", chi=8)
        psi_b = create_initial_state(6, "all_up", chi=8)
        path = str(tmp_path / "st_shadow")
        try:
            save_state(path, psi_a, {"v": 1}, format="orbax")
        except RuntimeError:
            pytest.skip("orbax not installed")
        _t.sleep(0.05)
        save_state(path, psi_b, {"v": 2}, format="npz")
        psi2, meta = load_state(path)
        assert meta == {"v": 2}
        np.testing.assert_array_equal(np.asarray(psi2.B.re),
                                      np.asarray(psi_b.B.re))

    def test_orbax_old_fallback_after_kill_mid_install(self, tmp_path):
        """A kill between save_state's two install renames leaves only
        <path>.orbax.old; state_exists/load_state must recover it instead
        of silently restarting a long run from period 0."""
        import os

        from timecrystal_tpu.utils.checkpoint import (load_state, save_state,
                                                      state_exists)
        pytest = __import__("pytest")
        psi = create_initial_state(6, "neel", chi=8)
        path = str(tmp_path / "st")
        try:
            save_state(path, psi, {"period": 9}, format="orbax")
        except RuntimeError:
            pytest.skip("orbax not installed")
        # simulate the kill window: target renamed aside, new one never
        # landed
        os.replace(path + ".orbax", path + ".orbax.old")
        assert state_exists(path)
        psi2, meta = load_state(path)
        assert meta == {"period": 9}
        np.testing.assert_array_equal(np.asarray(psi.B.re),
                                      np.asarray(psi2.B.re))
        # and a subsequent save installs a fresh target again
        save_state(path, psi, {"period": 10}, format="orbax")
        _, meta3 = load_state(path)
        assert meta3 == {"period": 10}


class TestMergedFrameAndPadding:
    def test_pad_mps_exact(self):
        from timecrystal_tpu.core.mps import pad_mps
        psi = create_initial_state(6, "neel", chi=4)
        big = pad_mps(psi, 16)
        assert big.chi == 16
        ov = cpx.abs2(overlap(big, big))
        np.testing.assert_allclose(float(ov), 1.0, atol=1e-12)

    def test_merged_frame_trace_parity_f64(self):
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, chi, n_per = 8, 16, 12
        hf = draw_disorder_reference(L, 0.3, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float64), 0.9,
                                   theta=0.92 * np.pi, dtype=jnp.float64)
        psi0 = create_initial_state(L, "neel", chi=chi, dtype=jnp.float64)
        tp = TruncParams(chi_max=0, svd_min=1e-14, svd_method="native")
        _, trs = evolve_floquet_scan(psi0, gates, n_per, tp, frame="strict")
        fm, trm = evolve_floquet_scan(psi0, gates, n_per, tp, frame="merged")
        np.testing.assert_allclose(np.asarray(trm["sz_sites"]),
                                   np.asarray(trs["sz_sites"]), atol=1e-12)
        np.testing.assert_allclose(np.asarray(trm["loschmidt_echo"]),
                                   np.asarray(trs["loschmidt_echo"]),
                                   atol=1e-12)
        # final state mapped back to the physical frame
        fs, _ = evolve_floquet_scan(psi0, gates, n_per, tp, frame="strict")
        np.testing.assert_allclose(float(cpx.abs2(overlap(fs, fm))), 1.0,
                                   atol=1e-10)
