"""Closed-loop check of the looser-tol jacobi_proj config.

chained_proj_timing.py measured (tol_b=1e-6, tol_d=1e-6, polish 4+4) at
101 ms/call vs the shipped default (3e-8, 3e-8, 6+6) at ~115 ms with the
same per-call S error -- but jacobi_sv's calibration notes warn loose
tols cost ~1 digit end-to-end.  This script settles 40 periods, then
evolves 50 steady periods three ways (production kernel / projected
default / projected tuned) and compares traces + throughput.  Adopt the
tuned config only if its trace deltas stay in the default's class.
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
from timecrystal_tpu.ops import csvd as csvd_mod
from timecrystal_tpu.ops.pallas import jacobi_svd as jsvd_mod

L, chi, N_STEADY = 40, 256, 50
h_fields = draw_disorder_reference(L, 0.3, 42)
gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32), 1.0,
                           theta=0.9 * np.pi, dtype=jnp.float32)
tp = TruncParams(chi_max=0, svd_min=1e-7, svd_method="jacobi")
tp_proj = tp._replace(svd_method="jacobi_proj")
psi = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
print("settling 40 periods...", flush=True)
psi, _ = evolve_floquet_scan(psi, gates, 40, tp, frame="merged")
np.asarray(psi.lam)

_orig_proj = jsvd_mod.jacobi_proj


def run(tag, tpx, tuned=False):
    import jax
    # the scan/bond-gate jits are keyed on static tp only: clear so the
    # monkeypatched jacobi_proj is actually retraced into the program
    jax.clear_caches()
    if tuned:
        # NOT functools.partial: the csvd call site passes
        # polish_b_iters=6/polish_iters=6 explicitly, which would override
        # partial keywords -- force the tuned values over incoming kwargs
        def _tuned_proj(theta, k, **kw):
            kw.update(tol=1e-6, tol_b=1e-6, polish_b_iters=4, polish_iters=4)
            return _orig_proj(theta, k, **kw)
        jsvd_mod.jacobi_proj = _tuned_proj
    else:
        jsvd_mod.jacobi_proj = _orig_proj
    try:
        _, tr = evolve_floquet_scan(psi, gates, N_STEADY, tpx, frame="merged")
        np.asarray(tr["loschmidt_echo"])
        t0 = time.time()
        _, tr = evolve_floquet_scan(psi, gates, N_STEADY, tpx, frame="merged")
        sz = np.asarray(tr["sz_sites"])
        le = np.asarray(tr["loschmidt_echo"])
        dt = time.time() - t0
    finally:
        jsvd_mod.jacobi_proj = _orig_proj
    print(f"{tag:10s}: {N_STEADY / dt:.2f} p/s", flush=True)
    return sz, le


sz_p, le_p = run("production", tp)
sz_d, le_d = run("proj-def", tp_proj)
sz_t, le_t = run("proj-tuned", tp_proj, tuned=True)
stag = (-1.0) ** np.arange(L)
for tag, sz, le in (("default", sz_d, le_d), ("tuned", sz_t, le_t)):
    ds = np.abs(np.mean(sz * stag, 1) - np.mean(sz_p * stag, 1)).max()
    dl = np.abs(le - le_p).max()
    dz = np.abs(sz - sz_p).max()
    print(f"proj-{tag:8s} vs production: |d stag|={ds:.3e} |d LE|={dl:.3e} "
          f"|d sz|={dz:.3e}", flush=True)
