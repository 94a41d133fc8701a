"""Closed-loop physics gating of the core-matrix projected SVD.

Settle 40 periods at L=40 chi=256 (production kernel), then evolve 50
more periods THREE ways from the same state: production jacobi_sv vs the
shipped jacobi_proj vs the new jacobi_core (tp.svd_method).  Compare
sz / staggered / LE traces and wall time.  Adoption gate (same bar the
tuned jacobi_proj config passed, PERFORMANCE.md round 3): jacobi_core's
trace deltas vs production must stay in jacobi_proj's class and the
period-doubling signal must be intact.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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

L, chi = 40, 256
N_STEADY = 50
h_fields = draw_disorder_reference(L, 0.3, 42)
gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32), 1.0,
                           theta=0.9 * np.pi, dtype=jnp.float32)
tp = TruncParams(chi_max=0, svd_min=1e-7, svd_method="jacobi")
psi = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
print("settling 40 periods (production kernel)...", flush=True)
psi, _ = evolve_floquet_scan(psi, gates, 40, tp, frame="merged")
np.asarray(psi.lam)

results = {}
for tag, method in (("production", "jacobi"), ("projected", "jacobi_proj"),
                    ("core", "jacobi_core")):
    tpx = tp._replace(svd_method=method)
    # warm compile at the same scan length
    _, tr = evolve_floquet_scan(psi, gates, N_STEADY, tpx, frame="merged")
    np.asarray(tr["loschmidt_echo"])
    t0 = time.time()
    _, tr = evolve_floquet_scan(psi, gates, N_STEADY, tpx, frame="merged")
    sz = np.asarray(tr["sz_sites"])
    le = np.asarray(tr["loschmidt_echo"])
    dt = time.time() - t0
    results[tag] = (sz, le, dt)
    print(f"{tag:12s}: {dt:.2f}s = {N_STEADY / dt:.2f} p/s", flush=True)

sz_p, le_p, _ = results["production"]
signs = (-1.0) ** np.arange(L)
stag_p = np.mean(sz_p * signs, axis=1)
for tag in ("projected", "core"):
    sz_x, le_x, _ = results[tag]
    stag_x = np.mean(sz_x * signs, axis=1)
    print(f"\n{tag} vs production over {N_STEADY} periods:")
    print(f"  max |d sz|={np.abs(sz_p - sz_x).max():.3e}  "
          f"max |d staggered|={np.abs(stag_p - stag_x).max():.3e}  "
          f"max |d LE|={np.abs(le_p - le_x).max():.3e}")
    print(f"  staggered (last 6): {np.round(stag_x[-6:], 5)}")
print(f"\nstaggered (prod, last 6): {np.round(stag_p[-6:], 5)}")
