"""Steady-state period cost breakdown at L=40 chi=256 (merged frame)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

from timecrystal_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from timecrystal_tpu.core.mps import create_initial_state
from timecrystal_tpu.core.truncate import TruncParams, apply_bond_gates
from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                 make_floquet_gates,
                                                 floquet_period_merged)
from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.cpx import C

L, chi = 40, 256
h_fields = draw_disorder_reference(L, 0.3, 42)
gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32), 1.0,
                           theta=0.9 * np.pi, dtype=jnp.float32)
tp = TruncParams(chi_max=0, svd_min=1e-7)
psi = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
print("settling 40 periods...", flush=True)
psi, _ = evolve_floquet_scan(psi, gates, 40, tp, frame="merged")
np.asarray(psi.lam)  # sync


def timeit(f, n=3, warm=1):
    for _ in range(warm):
        r = f()
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        r = f()
        best = min(best, time.time() - t0)
    return best, r


# 1. full merged period (scan of 5 to amortize dispatch)
def full5():
    p, tr = evolve_floquet_scan(psi, gates, 5, tp, frame="merged")
    np.asarray(tr["loschmidt_echo"])
    return None

t, _ = timeit(full5)
print(f"full merged period (scan/5): {t/5*1000:.1f} ms/period", flush=True)

# 2. bond-gate sweeps only (even + odd), jitted together, x5
from timecrystal_tpu.models.kicked_ising import _square_diagonal_gates
from timecrystal_tpu.models.kicked_ising import FloquetGates
full_gates = FloquetGates(bond_gates=_square_diagonal_gates(gates.bond_gates),
                          kick=gates.kick)

from functools import partial

@partial(jax.jit, static_argnames=("tp",))
def sweeps_only(psi, g, tp):
    def body(p, _):
        p, e1 = apply_bond_gates(p, g.bond_gates, start=0, tp=tp)
        p, e2 = apply_bond_gates(p, g.bond_gates, start=1, tp=tp)
        return p, e1 + e2
    p, errs = jax.lax.scan(body, psi, None, length=5)
    return p, errs

def sw():
    p, e = sweeps_only(psi, full_gates, tp)
    np.asarray(e)
    return None

t, _ = timeit(sw)
print(f"even+odd sweeps only: {t/5*1000:.1f} ms/period", flush=True)

# 3. capture thetas for one even sweep; time jacobi_sv alone
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_sv

idx = np.arange(0, L - 1, 2)
Bl = psi.B[jnp.asarray(idx)]
Br = psi.B[jnp.asarray(idx + 1)]
lamL = psi.lam[jnp.asarray(idx)]
g = full_gates.bond_gates[jnp.asarray(idx)]
theta_tilde = cpx.einsum("napb,nbqc->napqc", Bl, Br)
theta_tilde = cpx.einsum("npqrs,narsc->napqc", g, theta_tilde)
theta = theta_tilde * lamL[:, :, None, None, None]
M = theta.reshape(len(idx), chi * 2, 2 * chi)
M = C(jnp.asarray(np.asarray(M.re)), jnp.asarray(np.asarray(M.im)))
print("theta batch:", M.re.shape, flush=True)

def sv():
    S, V = jacobi_sv(M, polish=chi)
    np.asarray(S)
    return S

t, S = timeit(sv)
print(f"jacobi_sv (batch {len(idx)}, n={2*chi}, polish): {t*1000:.1f} ms/call", flush=True)

def sv_nopolish():
    S, V = jacobi_sv(M)
    np.asarray(S)
    return S

t, _ = timeit(sv_nopolish)
print(f"jacobi_sv (no polish): {t*1000:.1f} ms/call", flush=True)

# 4. count sweeps used: instrument via while loop... estimate by timing one
# fixed sweep through jacobi_svd kernel? Just report S spectrum occupancy.
Sn = np.asarray(S)
print("S rel spectrum per bond: max", Sn.max(axis=-1)[:4])
occ = (Sn > 1e-5 * Sn.max(axis=-1, keepdims=True)).sum(axis=-1)
print("significant ranks:", occ, flush=True)

# 5. observables cost (sz + LE + entropy + chi)
from timecrystal_tpu.core import gates as GG
from timecrystal_tpu.core.mps import (bond_dimensions, entanglement_entropy,
                                      expectation_one_site, overlap)

@jax.jit
def obs(p, ref):
    sz = expectation_one_site(p, GG.pauli_c("z", p.dtype)).re
    le = cpx.abs2(overlap(ref, p))
    ent = entanglement_entropy(p)
    mc = jnp.max(bond_dimensions(p)[1:-1], initial=1)
    return sz, le, ent, mc

def ob():
    r = obs(psi, psi)
    np.asarray(r[0]); return None

t, _ = timeit(ob)
print(f"observables: {t*1000:.1f} ms", flush=True)
