"""chi=512 production validation (round-2 VERDICT stretch item 10).

Round 2 had a single timing probe at L=40 chi=512 (2.09 s/period padded
cost) but no end-to-end accuracy check at that width.  This script:

  1. evolves the BENCH config (L=40, theta=0.9pi, h=0.3, seed 42) from the
     Neel state for 60 periods at chi=256 and chi=512 (fixed chi, merged
     frame, production kernel) and compares staggered/LE traces -- the
     chi-convergence evidence: if 256 -> 512 moves observables by <= the
     f32 drift class, chi=256 results are converged in chi;
  2. times the saturated steady state at chi=512 for both SVD paths
     (production jacobi_sv on [1024, 1024] and jacobi_proj on [1024, 512]
     panels) -- the measured chi=512 BENCH-style entries.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax.numpy as jnp

from timecrystal_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from timecrystal_tpu.core.mps import create_initial_state
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                 make_floquet_gates)

L = 40
N_PER = 60
N_TIMED = 5
h_fields = draw_disorder_reference(L, 0.3, 42)
gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32), 1.0,
                           theta=0.9 * np.pi, dtype=jnp.float32)
tp = TruncParams(chi_max=0, svd_min=1e-7)
stagger = (-1.0) ** np.arange(L)

CHUNK = 10      # periods per scan program: a 60-period chi=512 scan drove
                # the axon worker into a crash/restart once; chunking with a
                # host fetch between scans is observable-identical
traces = {}
for chi in (256, 512):
    psi0 = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
    psi = psi0
    t0 = time.time()
    sz_parts, le_parts, terr = [], [], 0.0
    for _ in range(N_PER // CHUNK):
        psi, tr = evolve_floquet_scan(psi, gates, CHUNK, tp, frame="merged",
                                      ref_state=psi0)
        sz_parts.append(np.asarray(tr["sz_sites"]))
        le_parts.append(np.asarray(tr["loschmidt_echo"]))
        terr += float(np.sum(np.asarray(tr["trunc_err"])))
    sz = np.concatenate(sz_parts)
    traces[chi] = dict(
        stag=np.mean(sz * stagger, axis=1),
        le=np.concatenate(le_parts),
        terr=terr,
        wall=time.time() - t0,
    )
    print(f"chi={chi}: {N_PER} periods in {traces[chi]['wall']:.1f}s "
          f"(incl. compile), total trunc_err={traces[chi]['terr']:.3e}",
          flush=True)

    # steady timing: continue from the settled state, all three kernels;
    # keep the last sz/LE rows per kernel for a steady trace-delta gate
    steady_tr = {}
    for tag, tpx in (("jacobi_sv", tp),
                     ("jacobi_proj", tp._replace(svd_method="jacobi_proj")),
                     ("jacobi_core", tp._replace(svd_method="jacobi_core"))):
        _, tr2 = evolve_floquet_scan(psi, gates, N_TIMED, tpx, frame="merged")
        np.asarray(tr2["loschmidt_echo"])
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            _, tr2 = evolve_floquet_scan(psi, gates, N_TIMED, tpx,
                                         frame="merged")
            np.asarray(tr2["loschmidt_echo"])
            best = max(best, N_TIMED / (time.time() - t0))
        steady_tr[tag] = (np.asarray(tr2["sz_sites"]),
                          np.asarray(tr2["loschmidt_echo"]))
        print(f"  steady chi={chi} {tag:12s}: {best:.3f} p/s", flush=True)
    sz_p, le_p = steady_tr["jacobi_sv"]
    for tag in ("jacobi_proj", "jacobi_core"):
        sz_x, le_x = steady_tr[tag]
        print(f"  {tag} vs jacobi_sv over {N_TIMED} steady periods: "
              f"max |d sz|={np.abs(sz_p - sz_x).max():.2e} "
              f"max |d LE|={np.abs(le_p - le_x).max():.2e}", flush=True)

dstag = np.abs(traces[256]["stag"] - traces[512]["stag"]).max()
dle = np.abs(traces[256]["le"] - traces[512]["le"]).max()
print(json.dumps({
    "chi_convergence_max_d_staggered": round(float(dstag), 6),
    "chi_convergence_max_d_le": round(float(dle), 6),
    "trunc_err_total_chi256": traces[256]["terr"],
    "trunc_err_total_chi512": traces[512]["terr"],
}), flush=True)
