#!/usr/bin/env python3
"""Run the five BASELINE.json workload configs end-to-end and record results.

Configs (BASELINE.json 'configs'):
  1. perfect_time_crystal:   clean kicked-Ising L=10, chi=32, 100 periods
  2. disordered_time_crystal: random fields, 20 disorder realizations
                              vmapped, L=12 chi=64
  3. time_crystal_with_dephasing: open-system Floquet with dephasing, L=12
  4. multisite_time_crystal_dynamics: per-site <sigma_z_i(t)>, L=20 chi=128
  5. phase-diagram sweep: drive x disorder grid, batched over devices

Writes benchmarks/baseline_configs_results.json with throughput numbers and
physics summaries.  Run on the TPU (default backend) or CPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from timecrystal_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from timecrystal_tpu.core.mps import create_initial_state
    from timecrystal_tpu.core import observables as obs
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.open_system import OpenSystemEvolution
    from timecrystal_tpu.dynamics.tebd import CustomFloquet
    from timecrystal_tpu.models.kicked_ising import KickedIsingModel
    from timecrystal_tpu.parallel.sweep import SweepSpec, disorder_ensemble
    from timecrystal_tpu.analysis.phase_diagram import sweep_phase_grid

    results = {"backend": jax.default_backend(),
               "device": str(jax.devices()[0])}
    tp = TruncParams(chi_max=0, svd_min=1e-7)

    def timed(label, fn):
        t0 = time.time()
        out = fn()
        wall = time.time() - t0
        print(f"[{label}] {wall:.2f}s")
        return out, wall

    # 1. perfect_time_crystal (clean, L=10, chi=32, 100 periods)
    m = KickedIsingModel(10, 1.0, 0.0, 1.0, h_fields=np.zeros(10), chi=32)
    psi0 = create_initial_state(10, "neel", chi=32)
    flo = CustomFloquet(m, tp)
    flo.evolve_floquet_traces(psi0, 100)  # compile
    (tr, times, info), wall = timed(
        "perfect_time_crystal", lambda: flo.evolve_floquet_traces(psi0, 100))
    a2t = obs.extract_subharmonic_amplitude(np.asarray(times),
                                            tr["staggered_magnetization"],
                                            2 * m.tau)
    results["perfect_time_crystal"] = {
        "periods_per_second": info["periods_per_second"],
        "subharmonic_A2T": float(a2t),
        "final_le": float(tr["loschmidt_echo"][-1]),
    }

    # 2. disordered_time_crystal (20 realizations vmapped, L=12 chi=64)
    spec = SweepSpec(L=12, chi=64, n_periods=100, theta=float(np.pi), tp=tp)
    key = jax.random.PRNGKey(42)
    disorder_ensemble(key, 20, spec, h_disorder=0.3, tau=1.0)  # compile
    (tr2), wall2 = timed("disordered_time_crystal",
                         lambda: jax.tree_util.tree_map(
                             np.asarray,
                             disorder_ensemble(key, 20, spec,
                                               h_disorder=0.3, tau=1.0)))
    stag = tr2["staggered_magnetization"]  # [20, 101]
    results["disordered_time_crystal"] = {
        "realizations": 20,
        "realization_periods_per_second": 20 * 100 / wall2,
        "mean_A2T": float(np.mean([
            obs.extract_subharmonic_amplitude(np.arange(101) * 2.0, s, 2.0)
            for s in stag])),
    }

    # 3. time_crystal_with_dephasing (open system, L=12)
    m3 = KickedIsingModel(12, 1.0, 0.3, 1.0, disorder_seed=42, chi=32)
    psi3 = create_initial_state(12, "neel", chi=32)
    ose = OpenSystemEvolution(m3, gamma=1e-3, max_chi=32, trunc_params=tp)
    ose.evolve(psi3, 5)  # compile
    (tr3, t3, info3), wall3 = timed("time_crystal_with_dephasing",
                                    lambda: ose.evolve(psi3, 100))
    results["time_crystal_with_dephasing"] = {
        "periods_per_second": 100 / info3["wall_time"],
        "gamma": 1e-3,
        "final_stag": float(tr3["staggered_magnetization"][-1]),
    }

    # 4. multisite_time_crystal_dynamics (true per-site traces, L=20 chi=128)
    m4 = KickedIsingModel(20, 1.0, 0.3, 1.0, disorder_seed=42, chi=128,
                          theta=0.97 * np.pi)
    psi4 = create_initial_state(20, "neel", chi=128)
    flo4 = CustomFloquet(m4, tp)
    flo4.evolve_floquet_traces(psi4, 5)  # compile
    (tr4, t4, info4), wall4 = timed(
        "multisite_time_crystal_dynamics",
        lambda: flo4.evolve_floquet_traces(psi4, 100))
    results["multisite_time_crystal_dynamics"] = {
        "periods_per_second": info4["periods_per_second"],
        "n_sites_tracked": int(tr4["sz_sites"].shape[1]),
        "max_chi": int(np.max(tr4["max_chi"])),
    }

    # 5. phase-diagram sweep (batched grid)
    params = {"J": 1.0, "RANDOM_SEED": 42, "SVD_MIN": 1e-12,
              "SVD_CUTOFF": 1e-7}
    hv = np.linspace(0.0, 0.8, 12)
    Tv = np.linspace(0.8, 4.0, 10)
    (res5), wall5 = timed("phase_diagram_sweep",
                          lambda: sweep_phase_grid(hv, Tv, params))
    a2t_grid = [r["A2T"] for r in res5["records"]]
    results["phase_diagram_sweep"] = {
        "grid_points": len(a2t_grid),
        "points_per_second": len(a2t_grid) / wall5,
        "max_A2T": float(np.max(a2t_grid)),
        "success_rate": float(np.mean([r["success"] for r in res5["records"]])),
    }

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "baseline_configs_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
