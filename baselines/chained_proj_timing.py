"""TPU timing probe: chained projected SVD (jacobi_proj) vs production
jacobi_sv on REAL captured steady-state thetas (L=40 chi=256, period 40+).

Reports wall ms per batched call (20 bonds), S error vs f64 LAPACK, and the
implied steady-state period time (2 calls + measured non-SVD remainder).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from timecrystal_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from timecrystal_tpu.core.mps import create_initial_state, apply_one_site_gates
from timecrystal_tpu.core.truncate import TruncParams, apply_bond_gates
from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                 make_floquet_gates,
                                                 _square_diagonal_gates,
                                                 FloquetGates)
from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_proj, jacobi_sv

L, chi = 40, 256
n = 2 * chi
h_fields = draw_disorder_reference(L, 0.3, 42)
gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32), 1.0,
                           theta=0.9 * np.pi, dtype=jnp.float32)
full_gates = FloquetGates(bond_gates=_square_diagonal_gates(gates.bond_gates),
                          kick=gates.kick)
tp = TruncParams(chi_max=0, svd_min=1e-7)
psi = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
print("settling 40 periods...", flush=True)
psi, _ = evolve_floquet_scan(psi, gates, 40, tp, frame="merged")
np.asarray(psi.lam)


def capture_even_thetas(psi):
    idx = np.arange(0, L - 1, 2)
    Bl = psi.B[jnp.asarray(idx)]
    Br = psi.B[jnp.asarray(idx + 1)]
    lamL = psi.lam[jnp.asarray(idx)]
    gg = full_gates.bond_gates[jnp.asarray(idx)]
    tt = cpx.einsum("napb,nbqc->napqc", Bl, Br)
    tt = cpx.einsum("npqrs,narsc->napqc", gg, tt)
    theta = tt * lamL[:, :, None, None, None]
    return theta.reshape(len(idx), chi * 2, 2 * chi)


psi = apply_one_site_gates(psi, gates.kick)
M = capture_even_thetas(psi)
M = C(jnp.asarray(np.asarray(M.re)), jnp.asarray(np.asarray(M.im)))
Mc = np.asarray(M.re, np.float64) + 1j * np.asarray(M.im, np.float64)
S_true = np.linalg.svd(Mc, compute_uv=False)
print(f"theta batch: {M.re.shape}", flush=True)


def fetch(x):
    return np.asarray(x)


def bench(name, f, *args):
    out = f(*args)
    fetch(out[0])
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        out = f(*args)
    fetch(out[0])
    dt = (time.time() - t0) / reps
    S_np = fetch(out[0])
    err = np.max(np.abs(S_np[:, :chi] - S_true[:, :chi]) / S_true[:, :1])
    print(f"{name:42s} {dt * 1e3:7.1f} ms  S err={err:.2e}", flush=True)
    return dt


prod = jax.jit(lambda th: jacobi_sv(
    C(jnp.swapaxes(th.re, -1, -2), -jnp.swapaxes(th.im, -1, -2)),
    polish=chi))
t_prod = bench("production jacobi_sv (theta^H, polish)", prod, M)

for tol_b, pb, tol_d, pd in (
        (3e-8, 12, 3e-8, 12),
        (3e-8, 4, 3e-8, 4),
        (3e-8, 0, 3e-8, 12),
        (1e-6, 12, 3e-8, 12),
        (1e-6, 4, 3e-8, 4),
        (1e-5, 12, 3e-8, 12),
        (1e-6, 4, 1e-6, 4),
):
    f = jax.jit(lambda th, tb=tol_b, pb=pb, td=tol_d, pd=pd: jacobi_proj(
        th, chi, tol=td, tol_b=tb, polish=chi,
        polish_b_iters=pb, polish_iters=pd))
    t_proj = bench(f"proj tol_b={tol_b} pb={pb} tol_d={tol_d} pd={pd}",
                   f, M)

print(f"\nimplied steady period: prod 2x{t_prod*1e3:.0f}ms + ~16ms rest",
      flush=True)
