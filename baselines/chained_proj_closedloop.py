"""Closed-loop physics validation of the chained projected SVD.

Settle 40 periods at L=40 chi=256 (production kernel), then evolve 50 more
periods TWICE from the same state: production jacobi_sv path vs the
jacobi_proj path (tp.svd_method='jacobi_proj').  Compare sz / staggered /
LE traces and wall time.  This is the decisive go/no-go: per-call S errors
(2.3e-5 boundary-concentrated) only matter through their closed-loop
accumulation.
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
tp_proj = TruncParams(chi_max=0, svd_min=1e-7, svd_method="jacobi_proj")
psi = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
print("settling 40 periods (production kernel)...", flush=True)
psi, _ = evolve_floquet_scan(psi, gates, 40, tp, frame="merged")
np.asarray(psi.lam)

results = {}
for tag, tpx in (("production", tp), ("projected", tp_proj)):
    # warm compile at the same scan length
    _, tr = evolve_floquet_scan(psi, gates, N_STEADY, tpx, frame="merged")
    np.asarray(tr["loschmidt_echo"])
    t0 = time.time()
    _, tr = evolve_floquet_scan(psi, gates, N_STEADY, tpx, frame="merged")
    sz = np.asarray(tr["sz_sites"])
    le = np.asarray(tr["loschmidt_echo"])
    terr = np.asarray(tr["trunc_err"])
    dt = time.time() - t0
    pps = N_STEADY / dt
    results[tag] = (sz, le, terr)
    print(f"{tag:12s}: {dt:.2f}s = {pps:.2f} p/s  "
          f"trunc_err/period median={np.median(terr):.2e}", flush=True)

sz_p, le_p, _ = results["production"]
sz_j, le_j, _ = results["projected"]
stag_p = np.mean(sz_p * ((-1.0) ** np.arange(L)), axis=1)
stag_j = np.mean(sz_j * ((-1.0) ** np.arange(L)), axis=1)
dsz = np.abs(sz_p - sz_j).max()
dstag = np.abs(stag_p - stag_j).max()
dle = np.abs(le_p - le_j).max()
print(f"\nmax |d sz|={dsz:.3e}  max |d staggered|={dstag:.3e}  "
      f"max |d LE|={dle:.3e} over {N_STEADY} periods", flush=True)
print("staggered (prod, last 6):", np.round(stag_p[-6:], 5))
print("staggered (proj, last 6):", np.round(stag_j[-6:], 5))
