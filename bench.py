#!/usr/bin/env python3
"""Headline benchmark: Floquet periods/sec at L=40, chi=256 (BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "periods/s", "vs_baseline": N}

vs_baseline divides by the recorded single-core CPU TEBD denominator
(baselines/baseline_cpu.json, produced by baselines/cpu_tebd.py -- a
reference-equivalent serial NumPy/LAPACK TEBD; TeNPy itself is not
installed in this image, and the stand-in is faster than TeNPy, i.e. the
ratio reported here is conservative).

The benchmark runs the ENTANGLING regime (theta = 0.9 pi) so the padded
chi=256 actually fills and every bond update pays a genuine 512x512 complex
SVD -- with the reference's exact-pi-pulse figure configs the dynamics stays
rank-1 and both stacks would only measure bookkeeping overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CONFIG = dict(L=40, chi=256, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
N_PERIODS = 30
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baselines", "baseline_cpu.json")
BASELINE_KEY = "L40_chi256_theta0.9pi"


def run_tpu(n_periods: int = N_PERIODS) -> float:
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

    # warmup + compile
    _, tr = evolve_floquet_scan(psi0, gates, 2, tp)
    jax.block_until_ready(tr["loschmidt_echo"])

    t0 = time.time()
    _, tr = evolve_floquet_scan(psi0, gates, n_periods, tp)
    jax.block_until_ready(tr["loschmidt_echo"])
    wall = time.time() - t0
    return n_periods / wall


def main() -> None:
    value = run_tpu()
    vs = None
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)
        denom = base.get(BASELINE_KEY, {}).get("periods_per_second_tail")
        if denom:
            vs = value / denom
    print(json.dumps({
        "metric": "floquet_periods_per_sec_L40_chi256_entangling",
        "value": round(value, 4),
        "unit": "periods/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
