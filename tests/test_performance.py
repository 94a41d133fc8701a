"""Performance-budget tier (reference tests/test_performance.py, SURVEY.md
section 4): wall-time ceilings, scaling checks, memory bounds, feasibility
floors -- re-expressed for the jit-compiled stack (budgets exclude the
one-time compilation, which the reference's interpreter-bound code has no
analog of).  Budgets are generous CI bounds, not measurements.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import psutil
import pytest

from timecrystal_tpu.core.mps import create_initial_state
from timecrystal_tpu.core import observables as obs
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
from timecrystal_tpu.models.kicked_ising import KickedIsingModel

DTYPE = jnp.float32  # perf tier runs at deployment precision
TP = TruncParams(chi_max=0, svd_min=1e-7)


def _model(L, chi=16, theta=0.95 * np.pi, seed=42):
    return KickedIsingModel(L, 1.0, 0.3, 1.0, disorder_seed=seed, chi=chi,
                            theta=theta, dtype=DTYPE)


def _timed_periods(m, psi0, n_periods):
    # warm the compile cache, then measure best-of-3 (single-shot ms-scale
    # timings flake under host load: a 16 ms t5 vs a scheduler-delayed
    # t20 once tripped the 8x linear-scaling bound in a loaded runner)
    _, tr = evolve_floquet_scan(psi0, m.gates, n_periods, TP)
    jax.block_until_ready(tr["loschmidt_echo"])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        _, tr = evolve_floquet_scan(psi0, m.gates, n_periods, TP)
        jax.block_until_ready(tr["loschmidt_echo"])
        best = min(best, time.time() - t0)
    return best


class TestPerformance:
    @pytest.mark.parametrize("L,budget", [(8, 0.5), (12, 1.0), (16, 2.0)])
    def test_single_floquet_step_budget(self, L, budget):
        """Reference ceilings: 0.1/0.5/2.0 s at L=8/12/16 (test_performance
        tier); compiled-path budgets here."""
        m = _model(L)
        psi0 = create_initial_state(L, "neel", chi=16, dtype=DTYPE)
        wall = _timed_periods(m, psi0, 1)
        assert wall < budget, f"single period {wall:.3f}s at L={L}"

    def test_ten_period_evolution_budget(self):
        """Reference: 10-period evolution < 10 s for L <= 16."""
        for L in (8, 12, 16):
            m = _model(L)
            psi0 = create_initial_state(L, "neel", chi=16, dtype=DTYPE)
            wall = _timed_periods(m, psi0, 10)
            assert wall < 10.0, f"10 periods took {wall:.1f}s at L={L}"

    def test_linear_scaling_in_periods(self):
        """Reference: time(20)/time(5) within 2x of linear."""
        m = _model(10)
        psi0 = create_initial_state(10, "neel", chi=16, dtype=DTYPE)
        t5 = _timed_periods(m, psi0, 5)
        t20 = _timed_periods(m, psi0, 20)
        assert t20 < 2.0 * 4.0 * max(t5, 1e-4)

    def test_memory_budget_model_construction(self):
        """Reference: 5x (L=12 model + short evolution) < 100 MB RSS growth."""
        proc = psutil.Process()
        rss0 = proc.memory_info().rss
        for k in range(5):
            m = _model(12, seed=k)
            psi0 = create_initial_state(12, "neel", chi=16, dtype=DTYPE)
            _, tr = evolve_floquet_scan(psi0, m.gates, 5, TP)
            jax.block_until_ready(tr["loschmidt_echo"])
        growth = (proc.memory_info().rss - rss0) / 1024**2
        assert growth < 400, f"RSS grew {growth:.0f} MB"

    def test_chi_scaling_cost_ratio(self):
        """Reference: cost ratio per chi doubling < 10x (chi 8->16->32)."""
        L = 12
        prev = None
        for chi in (8, 16, 32):
            m = _model(L, chi=chi)
            psi0 = create_initial_state(L, "neel", chi=chi, dtype=DTYPE)
            wall = _timed_periods(m, psi0, 5)
            if prev is not None:
                assert wall < 10.0 * max(prev, 1e-4), (chi, wall, prev)
            prev = wall

    def test_observable_evaluation_speed(self):
        """Reference: observable evaluation < 0.1 s average on an L=16 state."""
        m = _model(16)
        psi0 = create_initial_state(16, "neel", chi=16, dtype=DTYPE)
        psi = m.floquet_step(psi0, TP)
        sz = jax.jit(obs.sz_sites)
        stag = jax.jit(obs.staggered_magnetization)
        le = jax.jit(obs.calculate_loschmidt_echo)
        # warm the compile cache (production callers evaluate inside jit)
        jax.block_until_ready((sz(psi), stag(psi), le(psi0, psi)))
        t0 = time.time()
        for _ in range(10):
            jax.block_until_ready(sz(psi))
            jax.block_until_ready(stag(psi))
            jax.block_until_ready(le(psi0, psi))
        avg = (time.time() - t0) / 30
        assert avg < 0.1, f"{avg:.3f}s per observable"

    def test_concurrent_model_creation(self):
        """Reference: 10 model constructions < 5 s (name preserved; the
        reference's 'concurrent' test is also sequential)."""
        t0 = time.time()
        for k in range(10):
            _model(12, seed=k)
        assert time.time() - t0 < 5.0


class TestScalabilityLimits:
    def test_minimum_feasible_system(self):
        """Reference floors: >= 16 sites and >= 50 periods feasible."""
        m = _model(16)
        psi0 = create_initial_state(16, "neel", chi=16, dtype=DTYPE)
        wall = _timed_periods(m, psi0, 50)
        assert wall < 60.0, f"50 periods at L=16 took {wall:.1f}s"

    def test_batched_sweep_feasible(self):
        """TPU-new floor: a 16-realization vmapped ensemble must run."""
        from timecrystal_tpu.parallel.sweep import SweepSpec, disorder_ensemble
        spec = SweepSpec(L=8, chi=8, n_periods=5, theta=0.95 * float(np.pi),
                         tp=TP, dtype="float32")
        tr = disorder_ensemble(jax.random.PRNGKey(0), 16, spec,
                               h_disorder=0.3, tau=1.0)
        assert np.asarray(tr["loschmidt_echo"]).shape == (16, 6)
