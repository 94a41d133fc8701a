#!/usr/bin/env python3
"""Opt-in comprehensive benchmark: L x chi throughput tables.

Analog of the reference's print-only harnesses
(tests/test_basic_functionality.py:527-562 `run_performance_benchmark`,
tests/test_performance.py:437-506 `run_comprehensive_benchmark`), upgraded:
results are PERSISTED to benchmarks/comprehensive_results.json next to the
printed table, and both the strict and merged half-step frames are timed.

Usage:
    python benchmarks/comprehensive.py                 # default sweep
    python benchmarks/comprehensive.py --quick         # small smoke sweep
    python benchmarks/comprehensive.py --sizes 8 16 32 --chis 32 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_point(L: int, chi: int, n_periods: int, theta_frac: float,
                frame: str) -> dict:
    import jax.numpy as jnp

    from timecrystal_tpu.core.mps import create_initial_state
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
    from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                     make_floquet_gates)

    hf = draw_disorder_reference(L, 0.3, 42)
    gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float32), 1.0,
                               theta=theta_frac * np.pi, dtype=jnp.float32)
    psi0 = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
    tp = TruncParams(chi_max=0, svd_min=1e-7)
    # warmup with the SAME length: n_periods is static in the scan program
    _, tr = evolve_floquet_scan(psi0, gates, n_periods, tp, frame=frame)
    np.asarray(tr["loschmidt_echo"])
    t0 = time.time()
    _, tr = evolve_floquet_scan(psi0, gates, n_periods, tp, frame=frame)
    np.asarray(tr["loschmidt_echo"])
    wall = time.time() - t0
    return {
        "L": L, "chi": chi, "frame": frame, "n_periods": n_periods,
        "wall_time_s": round(wall, 4),
        "periods_per_second": round(n_periods / wall, 4),
        "max_chi_reached": int(np.max(np.asarray(tr["max_chi"]))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    ap.add_argument("--chis", type=int, nargs="*", default=None)
    ap.add_argument("--periods", type=int, default=20)
    ap.add_argument("--theta-frac", type=float, default=0.9,
                    help="kick angle / pi (0.9 = entangling regime)")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--output", type=str,
                    default=os.path.join(os.path.dirname(__file__),
                                         "comprehensive_results.json"))
    args = ap.parse_args()

    sizes = args.sizes or ([8, 12] if args.quick else [8, 12, 16, 20, 40])
    chis = args.chis or ([16, 32] if args.quick else [16, 32, 64, 128, 256])
    periods = 5 if args.quick else args.periods

    import jax
    platform = jax.devices()[0].platform
    print(f"platform: {platform}  ({len(jax.devices())} device(s))")
    header = f"{'L':>4} {'chi':>5} {'frame':>7} {'wall (s)':>10} " \
             f"{'periods/s':>11} {'max chi':>8}"
    print(header)
    print("-" * len(header))
    rows = []
    for L in sizes:
        for chi in chis:
            if chi > 2 ** (L // 2):
                continue       # padded chi beyond exact rank: skip
            for frame in ("strict", "merged"):
                r = bench_point(L, chi, periods, args.theta_frac, frame)
                rows.append(r)
                print(f"{r['L']:>4} {r['chi']:>5} {r['frame']:>7} "
                      f"{r['wall_time_s']:>10.3f} "
                      f"{r['periods_per_second']:>11.3f} "
                      f"{r['max_chi_reached']:>8}")
    out = {"platform": platform, "theta_frac": args.theta_frac,
           "n_periods": periods, "rows": rows}
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {args.output}")


if __name__ == "__main__":
    main()
