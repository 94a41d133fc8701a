"""Application-layer tests: config parsing, DTC detection, phase points,
figure workflows (reference tests/test_basic_functionality.py integration
tiers, SURVEY.md section 4)."""

import os

import numpy as np

from timecrystal_tpu.analysis.detection import (physics_penalties,
                                                score_phase_point,
                                                stringent_dtc_detection)
from timecrystal_tpu.utils.config import read_parameters


class TestConfigParser:
    def test_grammar(self, tmp_path):
        cfg = tmp_path / "params.txt"
        cfg.write_text(
            "# comment line\n"
            "\n"
            "J = 1\n"
            "TAU = 0.5  # trailing comment\n"
            "H_VALUES = [0.1, 0.2, 0.3]\n"
            "COUNTS = [1, 2, 3]\n"
            "SAVE_FORMATS = png,pdf\n"
            "MIXED = 1.5, 2.5\n"
            "STATE_TYPE = neel\n"
            "CUTOFF = 1e-7\n"
            "EMPTY_LIST = []\n"
        )
        p = read_parameters(str(cfg))
        assert p["J"] == 1 and isinstance(p["J"], int)
        assert p["TAU"] == 0.5 and isinstance(p["TAU"], float)
        assert p["H_VALUES"] == [0.1, 0.2, 0.3]
        assert p["COUNTS"] == [1, 2, 3]
        assert p["SAVE_FORMATS"] == ["png", "pdf"]
        assert p["MIXED"] == [1.5, 2.5]
        assert p["STATE_TYPE"] == "neel"
        assert p["CUTOFF"] == 1e-7
        assert p["EMPTY_LIST"] == []

    def test_missing_file_behavior(self, tmp_path, monkeypatch):
        import pytest

        monkeypatch.chdir(tmp_path)
        # no file anywhere and NO explicit path: {} with a warning
        # (reference main.py:75-77 behavior)
        assert read_parameters(None) == {}
        # an EXPLICIT path that does not exist must raise, never silently
        # fall back to ./config.txt (wrong-physics hazard)
        with pytest.raises(FileNotFoundError, match="nope.txt"):
            read_parameters("nope.txt")

    def test_repo_config_loads(self):
        p = read_parameters(os.path.join(os.path.dirname(__file__), "..",
                                         "config.txt"))
        assert p["J"] == 1.0
        assert p["CHI_MAX"] == 256
        assert p["SVD_CUTOFF"] == 1e-7
        assert p["RANDOM_SEED"] == 42
        assert p["SAVE_FORMATS"] == ["png", "pdf"]


class TestDetection:
    def _perfect_series(self, n=100, period=4.0):
        t = np.arange(n) * period
        le = 0.5 + 0.5 * np.cos(np.pi * t / period)  # period-2T alternation
        return le, t

    def test_perfect_dtc_scores_high(self):
        le, t = self._perfect_series()
        score = stringent_dtc_detection(le, t, period=4.0)
        assert score > 0.5

    def test_random_series_scores_zero(self):
        rng = np.random.default_rng(0)
        t = np.arange(100) * 4.0
        le = rng.uniform(0, 1, 100)
        assert stringent_dtc_detection(le, t, period=4.0) == 0.0

    def test_decaying_series_scores_lower(self):
        le, t = self._perfect_series()
        decayed = le * np.exp(-t / 100.0)
        assert stringent_dtc_detection(decayed, t, 4.0) <= \
            stringent_dtc_detection(le, t, 4.0) + 1e-9

    def test_short_series_zero(self):
        assert stringent_dtc_detection([1.0] * 10, list(range(10)), 2.0) == 0.0

    def test_penalties(self):
        p = physics_penalties(0.7, 2.0, 5.0)
        assert p["disorder_penalty"] < 1.0
        assert p["heating_penalty"] == 1.0
        p = physics_penalties(0.3, 0.9, 5.0)
        assert p["heating_penalty"] == 0.9
        p = physics_penalties(0.3, 3.8, 5.0)
        assert p["adiabatic_penalty"] < 1.0
        p = physics_penalties(0.3, 2.0, 1.0)
        assert p["entanglement_penalty"] == 0.5

    def test_score_phase_point_contract(self):
        le, t = self._perfect_series()
        rec = score_phase_point(le, t, [2] * len(le), 0.25, 2.0, 4.0)
        for key in ("A2T", "dtc_score_raw", "disorder_penalty",
                    "heating_penalty", "adiabatic_penalty",
                    "entanglement_penalty", "avg_bond_dim", "final_le",
                    "success"):
            assert key in rec
        assert rec["success"] is True
        assert 0.0 <= rec["A2T"] <= 1.0

    def test_failure_masking(self):
        rec = score_phase_point([np.nan] * 30, list(range(30)), [1] * 30,
                                0.2, 2.0, 4.0)
        assert rec["A2T"] == 0.0


class TestPhasePoint:
    def test_calculate_phase_point_end_to_end(self):
        from timecrystal_tpu.analysis.phase_diagram import calculate_phase_point
        params = {"J": 1.0, "RANDOM_SEED": 42, "SVD_MIN": 1e-12,
                  "SVD_CUTOFF": 1e-7}
        rec = calculate_phase_point(0.25, 2.0, params)
        assert rec["success"]
        assert 0.0 <= rec["A2T"] <= 1.0
        assert rec["final_le"] >= 0.0


class TestFigureWorkflows:
    PARAMS = {"J": 1.0, "CHI_MAX": 32, "SVD_MIN": 1e-12, "SVD_CUTOFF": 1e-7,
              "RANDOM_SEED": 42}

    def test_simulate_perfect_dtc_small(self):
        from timecrystal_tpu.analysis.figures import simulate_perfect_dtc
        times, stag, total = simulate_perfect_dtc(self.PARAMS, n_sites=8,
                                                  n_periods=24)
        assert len(times) == len(stag) == len(total) == 25
        # period-doubling: staggered magnetization alternates sign
        signs = np.sign(stag)
        assert signs[0] > 0 and signs[1] < 0 and signs[2] > 0

    def test_simulate_dephasing_applies_decay(self):
        from timecrystal_tpu.analysis.figures import (simulate_dephasing_dtc,
                                                      simulate_perfect_dtc)
        times, stag, _ = simulate_dephasing_dtc(self.PARAMS, n_sites=8,
                                                n_periods=24)
        # envelope decays: |stag(t)| <= e^{-gamma t}
        env = np.exp(-0.01 * np.asarray(times))
        assert np.all(np.abs(stag) <= env + 1e-5)  # f32 traces

    def test_multisite_true_per_site_values(self):
        from timecrystal_tpu.analysis.figures import simulate_multi_site_dtc
        times, site_mags = simulate_multi_site_dtc(self.PARAMS, n_periods=16)
        assert len(site_mags) == 6
        for m in site_mags:
            assert np.all(np.abs(np.asarray(m)) <= 1 + 1e-5)  # true expectations (f32)

    def test_generate_figures_writes_files(self, tmp_path, monkeypatch):
        """Full figure pipeline with tiny sims (savefig exercised for real,
        into a temp dir -- stronger than the reference's patched-out test)."""
        import timecrystal_tpu.analysis.figures as F
        orig_a, orig_b = F.simulate_perfect_dtc, F.simulate_disordered_dtc
        orig_c, orig_d = F.simulate_dephasing_dtc, F.simulate_multi_site_dtc
        monkeypatch.setattr(F, "simulate_perfect_dtc", lambda p: orig_a(p, 8, 24))
        monkeypatch.setattr(F, "simulate_disordered_dtc", lambda p: orig_b(p, 8, 24))
        monkeypatch.setattr(F, "simulate_dephasing_dtc", lambda p: orig_c(p, 8, 24))
        monkeypatch.setattr(F, "simulate_multi_site_dtc",
                            lambda p, sp=False: orig_d(p, sp, n_periods=24))
        F.generate_individual_figures(self.PARAMS, out_dir=str(tmp_path))
        for stem in ("perfect_time_crystal", "disordered_time_crystal",
                     "time_crystal_with_dephasing",
                     "multisite_time_crystal_dynamics"):
            assert (tmp_path / f"{stem}.png").exists()
            assert (tmp_path / f"{stem}.pdf").exists()


class TestCLI:
    def test_help_runs(self):
        import subprocess, sys
        out = subprocess.run([sys.executable, "main.py", "--help"],
                             capture_output=True, text=True,
                             cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert out.returncode == 0
        assert "--phase-only" in out.stdout
        assert "--figures-only" in out.stdout

    def test_backend_probe_mechanics(self):
        """utils.backend.backend_available: disabled probe (deadline <= 0)
        trusts the backend; an impossibly short deadline reads as a hung
        worker (TimeoutExpired -> False), which main()/quickstart turn
        into a CPU fallback."""
        from timecrystal_tpu.utils.backend import backend_available
        assert backend_available(deadline_s=0) is True
        assert backend_available(deadline_s=1e-4) is False


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        """__graft_entry__.entry(): the driver's single-chip compile check.
        In this process the CPU backend is already initialized (conftest),
        so entry() must skip the liveness probe and the returned fn must
        jit-compile and run on the example args."""
        import sys

        import jax

        jax.devices()   # init the conftest-forced CPU backend so entry()
        # sees backends_are_initialized() and skips its liveness probe
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__ as graft

        fn, args = graft.entry()
        psi_new, trunc_err = jax.jit(fn)(*args)
        assert np.all(np.isfinite(np.asarray(psi_new.lam)))
        assert float(trunc_err) >= 0.0
