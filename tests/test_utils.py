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
