#!/usr/bin/env python3
"""Headline benchmark (BASELINE.json): Floquet throughput at L=40, chi=256.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Two regimes of the same workload (L=40 chi=256 entangling, theta=0.9pi),
both measured, both compared window-matched against the recorded
single-core CPU TEBD (baselines/cpu_tebd.py -- reference-equivalent
serial NumPy/LAPACK TEBD with DYNAMIC per-bond rank, like TeNPy):

  * headline "window": the benchmark run itself -- 20 periods from the
    Neel state.  The theta rank stays < 64 for ~20 periods
    (baselines/proj_leak_profile.py), the CPU stack exploits that
    via dynamic shapes, and so do we via chi-staged evolution
    (dynamics/tebd.evolve_floquet_auto: padded chi 32 -> 64 -> ...,
    escalate-and-rerun on saturation -- identical observables).
    vs_baseline divides by the CPU's own first-20-period throughput.
  * extra "steady": saturated-chi throughput (10 periods started from
    the period-40 state, chi pinned at 256) vs the CPU's steady tail --
    the sustained-cost comparison with no transient in either number.

The ENTANGLING regime (theta = 0.9 pi) is used so chi genuinely grows and
every bond update pays a real SVD -- with the reference's exact-pi-pulse
figure configs the dynamics stays rank-1 and both stacks would only
measure bookkeeping overhead.

TeNPy itself is not installed in this image; the recorded stand-in is
faster than TeNPy, so the reported ratios are conservative.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CONFIG = dict(L=40, chi=256, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
N_WINDOW = 20           # the benchmark window (periods from t=0)
N_STEADY = 10           # timed steady-state periods (from period 40)
N_SETTLE = 40           # periods evolved (staged) to reach saturation
CHI_START = 32
CHUNK = 5
if os.environ.get("TCT_BENCH_QUICK"):
    # contract smoke mode (tests/test_tpu_smoke.py): tiny shapes, same
    # code path and output format
    CONFIG = dict(L=12, chi=32, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
    N_WINDOW = 5
    N_STEADY = 3
    N_SETTLE = 5
    CHI_START = 16
    CHUNK = 5
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baselines", "baseline_cpu.json")
# steady-state denominator (60-period run, tail=10; per-period series used
# for the window-matched transient denominator)
BASELINE_KEY = "L40_chi256_theta0.9pi_steady"


def _model_kwargs() -> dict:
    cfg = CONFIG
    return dict(n_sites=cfg["L"], J=1.0, h_disorder=cfg["h"],
                tau=cfg["tau"], disorder_seed=cfg["seed"],
                theta=cfg["theta_frac"] * np.pi)


def run_window(n_periods: int) -> float:
    """Chi-staged 20-period run from t=0 (the benchmark workload itself)."""
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_auto

    tp = TruncParams(chi_max=0, svd_min=1e-7)

    def once() -> float:
        t0 = time.time()
        _, _, info, _ = evolve_floquet_auto(
            _model_kwargs(), "neel", n_periods, tp,
            chi_start=CHI_START, chi_limit=CONFIG["chi"],
            chunk_periods=CHUNK, frame="merged")
        return n_periods / (time.time() - t0)

    once()                         # warmup: compiles every stage program
    return max(once() for _ in range(3))


def _steady_state():
    """Evolve (staged, cheap) to period N_SETTLE; return (psi, gates)."""
    import jax.numpy as jnp

    from timecrystal_tpu.core.mps import create_initial_state, pad_mps
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
    from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                     make_floquet_gates)

    cfg = CONFIG
    h_fields = draw_disorder_reference(cfg["L"], cfg["h"], cfg["seed"])
    gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32),
                               cfg["tau"], theta=cfg["theta_frac"] * np.pi,
                               dtype=jnp.float32)
    tp = TruncParams(chi_max=0, svd_min=1e-7)
    psi = create_initial_state(cfg["L"], "neel", chi=cfg["chi"],
                               dtype=jnp.float32)
    psi, _ = evolve_floquet_scan(psi, gates, N_SETTLE, tp, frame="merged")
    return psi, gates, tp


def run_steady(n_periods: int) -> float:
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan

    psi, gates, tp = _steady_state()
    _, tr = evolve_floquet_scan(psi, gates, n_periods, tp, frame="merged")
    np.asarray(tr["loschmidt_echo"])         # sync (block_until_ready is a
    best = 0.0                               # no-op through the axon tunnel)
    for _ in range(3):
        t0 = time.time()
        _, tr = evolve_floquet_scan(psi, gates, n_periods, tp,
                                    frame="merged")
        np.asarray(tr["loschmidt_echo"])
        best = max(best, n_periods / (time.time() - t0))
    return best


def main() -> None:
    from timecrystal_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    window = run_window(N_WINDOW)
    steady = run_steady(N_STEADY)

    denom_window = denom_steady = None
    # quick mode runs a tiny config: the recorded L=40 denominators do not
    # apply, so vs_baseline stays None (the contract test checks keys only)
    if not os.environ.get("TCT_BENCH_QUICK") and os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f).get(BASELINE_KEY, {})
        denom_steady = base.get("periods_per_second_tail")
        pp = base.get("per_period_seconds")
        if pp and len(pp) >= N_WINDOW:
            denom_window = N_WINDOW / sum(pp[:N_WINDOW])

    print(json.dumps({
        "metric": "window_periods_per_sec_L40_chi256_entangling",
        "value": round(window, 4),
        "unit": "periods/s (20-period benchmark window, chi-staged, "
                "one v5e chip)",
        "vs_baseline": round(window / denom_window, 3) if denom_window
        else None,
        "steady_periods_per_sec": round(steady, 4),
        "steady_vs_baseline": round(steady / denom_steady, 3)
        if denom_steady else None,
        "baseline": "single-core NumPy/LAPACK TEBD (reference-equivalent, "
                    "dynamic rank); window %.4f p/s, steady %.4f p/s"
                    % (denom_window or 0.0, denom_steady or 0.0),
    }))


if __name__ == "__main__":
    main()
