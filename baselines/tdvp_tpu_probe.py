"""TPU TDVP timing probe (round-2 VERDICT weak #8) -- VERDICT: the
eigh-based factorizations are the RIGHT choice; Jacobi routing REJECTED.

Round-3 A/B on this probe (L=16 chi=64, warm in-process period):

  eigh paths (shipped):       0.12 s/period = 8.5 periods/s
  Jacobi-routed (reverted):   0.52 s/period = 1.9 periods/s   (4.4x SLOWER)

The round-1 'flat ~150-650 ms eigh cost' applies to LARGE single calls
(n >= 512 class), not to small-n eigh fused INSIDE a jit program: a
jitted cqr_tall at [128, 64] costs 9.2 ms via gram_eigh vs 6.8 ms via a
standalone Pallas-Jacobi call, but inside TDVP's per-site lax.scan the
kernel's XLA-level while_loop of launches stalls the pipeline and loses
4.4x overall.  heigh gram_eigh [64, 64] = 4.2 ms ~= jacobi_psd 4.0 ms
(dispatch-bound, and jacobi_psd was less accurate: 3e-5 vs 7e-7);
jnp.linalg.eigh [10, 10] = 3.4 ms ~= unrolled XLA Jacobi 3.8 ms.
Conclusion recorded in ops/csvd.cqr_tall's docstring; TDVP stays on
eigh.  So TDVP on TPU was never eigh-BOUND -- at 8.5 p/s it is usable
as-is and benchmark_vs_tebd is informative.

This probe measures a TDVPFloquetEvolution period and benchmark_vs_tebd
on the TPU, plus a physics sanity (overlap with the TEBD result).
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
from timecrystal_tpu.dynamics.tdvp import TDVPFloquetEvolution
from timecrystal_tpu.models.kicked_ising import KickedIsingModel

L, chi = 16, 64
m = KickedIsingModel(L, J=1.0, h_disorder=0.3, tau=1.0, disorder_seed=42,
                     chi=chi, theta=0.95 * np.pi, dtype=jnp.float32)
psi0 = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
tfe = TDVPFloquetEvolution(m, dt=0.1, max_chi=chi, tdvp_type="single_site")

print("compiling TDVP Floquet period...", flush=True)
t0 = time.time()
psi = tfe.evolve_floquet_period(psi0)
np.asarray(psi.lam)
print(f"first period (incl. compile): {time.time() - t0:.1f}s", flush=True)

t0 = time.time()
reps = 3
for _ in range(reps):
    psi = tfe.evolve_floquet_period(psi)
np.asarray(psi.lam)
dt = (time.time() - t0) / reps
print(f"warm TDVP Floquet period: {dt:.2f}s = {1 / dt:.2f} periods/s",
      flush=True)

print("\nbenchmark_vs_tebd([8, 12, 16], 3):", flush=True)
res = tfe.benchmark_vs_tebd([8, 12, 16], n_periods=3)
for Ls in (8, 12, 16):
    print(f"  L={Ls}: tebd {res['tebd_times'][Ls]:.2f}s  "
          f"tdvp {res['tdvp_times'][Ls]:.2f}s  "
          f"speedup {res['speedup'][Ls]:.3f}  error {res['error'][Ls]:.2e}",
          flush=True)
