#!/usr/bin/env python3
"""Headline benchmark (BASELINE.json): Floquet throughput at L=40, chi=256.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Two sanctioned metrics (BASELINE.json: "Floquet periods/sec at L=40 chi=256;
disorder realizations/sec on v5e-8"):
  * headline: aggregate chain-periods/sec of a small vmapped disorder batch
    (R=2 saturates this chip) -- the chip-vs-single-core comparison;
  * extra:    single-chain periods/sec (pure serial latency).

vs_baseline divides by the recorded single-core CPU TEBD denominator
(baselines/baseline_cpu.json from baselines/cpu_tebd.py -- a
reference-equivalent serial NumPy/LAPACK TEBD; TeNPy itself is not
installed in this image and is slower than the stand-in, so the reported
ratio is conservative).

The benchmark runs the ENTANGLING regime (theta = 0.9 pi) so the padded
chi=256 genuinely fills and every bond update pays a full 512x512 complex
SVD -- with the reference's exact-pi-pulse figure configs the dynamics
stays rank-1 and both stacks would only measure bookkeeping overhead.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CONFIG = dict(L=40, chi=256, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
N_PERIODS_SINGLE = 20
N_PERIODS_BATCH = 10
BATCH_R = 2
if os.environ.get("TCT_BENCH_QUICK"):
    # contract smoke mode (tests/test_tpu_smoke.py): tiny shapes, same
    # code path and output format
    CONFIG = dict(L=12, chi=32, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
    N_PERIODS_SINGLE = 5
    N_PERIODS_BATCH = 3
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baselines", "baseline_cpu.json")
# steady-state denominator (60-period run, tail=10; the 30-period tail in
# round 1 was still mid-chi-ramp and understated CPU speed)
BASELINE_KEY = "L40_chi256_theta0.9pi_steady"


def run_single(n_periods: int) -> float:
    import jax
    import jax.numpy as jnp

    from timecrystal_tpu.core.mps import create_initial_state
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
    from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                     make_floquet_gates)

    cfg = CONFIG
    h_fields = draw_disorder_reference(cfg["L"], cfg["h"], cfg["seed"])
    gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32),
                               cfg["tau"], theta=cfg["theta_frac"] * np.pi,
                               dtype=jnp.float32)
    psi0 = create_initial_state(cfg["L"], "neel", chi=cfg["chi"],
                                dtype=jnp.float32)
    tp = TruncParams(chi_max=0, svd_min=1e-7)
    # half-step merged frame: one Ising sweep per period instead of two;
    # sz/staggered/LE traces are EXACTLY the strict-frame values
    # (models/kicked_ising.floquet_period_merged -- verified to 1e-14 in f64)
    # warmup at the SAME length (n_periods is a static scan parameter, so a
    # different length is a different XLA program -- a 2-period warmup would
    # leave the timed call to compile on a cold cache)
    _, tr = evolve_floquet_scan(psi0, gates, n_periods, tp, frame="merged")
    np.asarray(tr["loschmidt_echo"])
    t0 = time.time()
    _, tr = evolve_floquet_scan(psi0, gates, n_periods, tp, frame="merged")
    np.asarray(tr["loschmidt_echo"])
    return n_periods / (time.time() - t0)


def run_batched(R: int, n_periods: int) -> float:
    import jax
    import jax.numpy as jnp

    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.models.kicked_ising import draw_disorder_batch
    from timecrystal_tpu.parallel.sweep import (SweepSpec, _basis_indices,
                                                evolve_batch)

    cfg = CONFIG
    spec = SweepSpec(L=cfg["L"], chi=cfg["chi"], n_periods=n_periods,
                     theta=cfg["theta_frac"] * float(np.pi),
                     tp=TruncParams(chi_max=0, svd_min=1e-7),
                     dtype="float32", frame="merged")
    basis = jnp.asarray(_basis_indices(cfg["L"], "neel"))
    h = draw_disorder_batch(jax.random.PRNGKey(cfg["seed"]), R, cfg["L"],
                            cfg["h"])
    taus = jnp.full((R,), cfg["tau"])
    tr = evolve_batch(h, taus, basis, spec)              # warmup/compile
    np.asarray(tr["loschmidt_echo"])
    t0 = time.time()
    tr = evolve_batch(h, taus, basis, spec)
    np.asarray(tr["loschmidt_echo"])
    return R * n_periods / (time.time() - t0)


def main() -> None:
    from timecrystal_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    # device-tunnel timing is noisy: best of 3 repeats per metric
    single = max(run_single(N_PERIODS_SINGLE) for _ in range(3))
    aggregate = max(run_batched(BATCH_R, N_PERIODS_BATCH) for _ in range(3))
    denom = None
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            denom = json.load(f).get(BASELINE_KEY, {}).get(
                "periods_per_second_tail")
    print(json.dumps({
        "metric": "ensemble_chain_periods_per_sec_L40_chi256_entangling",
        "value": round(aggregate, 4),
        "unit": "chain-periods/s (vmapped R=%d, one v5e chip)" % BATCH_R,
        "vs_baseline": round(aggregate / denom, 3) if denom else None,
        "single_chain_periods_per_sec": round(single, 4),
        "single_chain_vs_baseline": round(single / denom, 3) if denom else None,
        "baseline": "single-core NumPy/LAPACK TEBD (reference-equivalent), "
                    "%.4f periods/s" % denom if denom else None,
    }))


if __name__ == "__main__":
    main()
