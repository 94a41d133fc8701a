"""Fine-grained steady-state period cost breakdown at L=40 chi=256.

Questions this answers (round 3 perf work):
  1. sweep counts of the even/odd jacobi_sv calls inside a real period;
  2. where the non-SVD ~160 ms/period goes (kick, theta build, truncate
     tail, obs, scan overhead);
  3. jacobi_sv overhead outside the sweep loop (sort/normalize/polish).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

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

L, chi = 40, 256
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


def timeit(f, n=5, warm=1):
    for _ in range(warm):
        f()
    best = np.inf
    for _ in range(n):
        t0 = time.time()
        f()
        best = min(best, time.time() - t0)
    return best


# null fetch cost
z = jnp.zeros(4)
null = timeit(lambda: np.asarray(z))
print(f"null fetch: {null*1000:.1f} ms", flush=True)

# --- pieces, each jitted and repeated x5 inside one program ----------------
@partial(jax.jit, static_argnames=("tp",))
def kick5(psi, g, tp):
    def body(p, _):
        return apply_one_site_gates(p, g.kick), 0
    p, _ = jax.lax.scan(body, psi, None, length=5)
    return p.B.re[0, 0, 0, 0]

@partial(jax.jit, static_argnames=("tp",))
def even5(psi, g, tp):
    def body(p, _):
        p, e = apply_bond_gates(p, g.bond_gates, start=0, tp=tp)
        return p, e
    p, errs = jax.lax.scan(body, psi, None, length=5)
    return errs

@partial(jax.jit, static_argnames=("tp",))
def evenodd5(psi, g, tp):
    def body(p, _):
        p, e1 = apply_bond_gates(p, g.bond_gates, start=0, tp=tp)
        p, e2 = apply_bond_gates(p, g.bond_gates, start=1, tp=tp)
        return p, e1 + e2
    p, errs = jax.lax.scan(body, psi, None, length=5)
    return errs

@partial(jax.jit, static_argnames=("tp",))
def fullperiod5(psi, g, tp):
    from timecrystal_tpu.models.kicked_ising import floquet_period_merged
    def body(p, _):
        p, e = floquet_period_merged(p, g, tp)
        return p, e
    p, errs = jax.lax.scan(body, psi, None, length=5)
    return errs

from timecrystal_tpu.core import gates as GG
from timecrystal_tpu.core.mps import (bond_dimensions, entanglement_entropy,
                                      expectation_one_site, overlap)

@jax.jit
def obs5(p, ref):
    def body(c, _):
        sz = expectation_one_site(p, GG.pauli_c("z", p.dtype)).re
        le = cpx.abs2(overlap(ref, p))
        ent = entanglement_entropy(p)
        mc = jnp.max(bond_dimensions(p)[1:-1], initial=1)
        return c + sz[0] + le + ent[0] + mc, 0
    c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=5)
    return c

t = timeit(lambda: np.asarray(kick5(psi, gates, tp)))
print(f"kick only:        {(t-null)/5*1000:7.1f} ms/period", flush=True)
t = timeit(lambda: np.asarray(even5(psi, full_gates, tp)))
print(f"even sweep only:  {(t-null)/5*1000:7.1f} ms/period", flush=True)
t = timeit(lambda: np.asarray(evenodd5(psi, full_gates, tp)))
print(f"even+odd sweeps:  {(t-null)/5*1000:7.1f} ms/period", flush=True)
t = timeit(lambda: np.asarray(fullperiod5(psi, gates, tp)))
print(f"kick+even+odd:    {(t-null)/5*1000:7.1f} ms/period", flush=True)
t = timeit(lambda: np.asarray(obs5(psi, psi)))
print(f"obs x1 (in scan x5): {(t-null)/5*1000:7.1f} ms", flush=True)

# --- full merged period via evolve_floquet_scan (the production path) ------
def prod5():
    p, tr = evolve_floquet_scan(psi, gates, 5, tp, frame="merged")
    np.asarray(tr["loschmidt_echo"])

t = timeit(prod5)
print(f"production scan:  {(t-null)/5*1000:7.1f} ms/period", flush=True)

# --- sweep counts: rebuild jacobi_sv's while loop with count output --------
from timecrystal_tpu.ops.pallas.jacobi_svd import (_jacobi_sweep_kernel,
                                                   _pick_block)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@partial(jax.jit, static_argnames=("max_sweeps", "tol"))
def sweep_count(theta, max_sweeps=12, tol=3e-8):
    Bn0, m, n = theta.re.shape
    A = C(jnp.swapaxes(theta.re, -1, -2), -jnp.swapaxes(theta.im, -1, -2))
    per_mat_bytes = (10 * m * n) * np.dtype(theta.dtype).itemsize
    G = _pick_block(Bn0, per_mat_bytes, 50 * 2**20)
    pad = (-Bn0) % G
    if pad:
        A = C(jnp.concatenate([A.re, jnp.zeros((pad, m, n), theta.dtype)]),
              jnp.concatenate([A.im, jnp.zeros((pad, m, n), theta.dtype)]))
    Bn = Bn0 + pad
    kernel = _jacobi_sweep_kernel(n)
    n_blocks = Bn // G
    out_shape = [jax.ShapeDtypeStruct((Bn, m, n), theta.dtype),
                 jax.ShapeDtypeStruct((Bn, m, n), theta.dtype),
                 jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32)]
    block = pl.BlockSpec((G, m, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    off2_spec = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    sweep_call = pl.pallas_call(
        kernel, grid=(n_blocks,), out_shape=out_shape,
        in_specs=[block, block], out_specs=[block, block, off2_spec],
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[pltpu.VMEM((G, 3, n // 2), theta.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def cond(carry):
        s, off2, _, _ = carry
        return (s < max_sweeps) & (off2 >= np.float32(tol * tol))

    def body(carry):
        s, _, re, im = carry
        re, im, off2b = sweep_call(re, im)
        return (s + 1, jnp.max(off2b), re, im)

    s, off2, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.float32(jnp.inf), A.re, A.im))
    return s, off2


# capture even + odd thetas from a real period
def capture_thetas(psi, g, start):
    idx = np.arange(start, L - 1, 2)
    Bl = psi.B[jnp.asarray(idx)]
    Br = psi.B[jnp.asarray(idx + 1)]
    lamL = psi.lam[jnp.asarray(idx)]
    gg = g.bond_gates[jnp.asarray(idx)]
    tt = cpx.einsum("napb,nbqc->napqc", Bl, Br)
    tt = cpx.einsum("npqrs,narsc->napqc", gg, tt)
    theta = tt * lamL[:, :, None, None, None]
    return theta.reshape(len(idx), chi * 2, 2 * chi)

psi_k = apply_one_site_gates(psi, gates.kick)
M_even = capture_thetas(psi_k, full_gates, 0)
s, off2 = sweep_count(M_even)
print(f"even-call sweeps: {int(s)}  off2={float(off2):.2e}", flush=True)
psi_e, _ = apply_bond_gates(psi_k, full_gates.bond_gates, start=0, tp=tp)
M_odd = capture_thetas(psi_e, full_gates, 1)
s, off2 = sweep_count(M_odd)
print(f"odd-call sweeps:  {int(s)}  off2={float(off2):.2e}", flush=True)

# --- jacobi_sv overhead outside sweeps (max_sweeps=0 -> no sweep launches)
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_sv

def sv0():
    S, V = jacobi_sv(M_even, max_sweeps=0, polish=chi)
    np.asarray(S)

t = timeit(sv0)
print(f"jacobi_sv overhead (0 sweeps, polish): {(t-null)*1000:7.1f} ms", flush=True)

def sv0np():
    S, V = jacobi_sv(M_even, max_sweeps=0)
    np.asarray(S)

t = timeit(sv0np)
print(f"jacobi_sv overhead (0 sweeps, no polish): {(t-null)*1000:7.1f} ms", flush=True)

def svfull():
    S, V = jacobi_sv(M_even, polish=chi)
    np.asarray(S)

t = timeit(svfull)
print(f"jacobi_sv full (even thetas, polish): {(t-null)*1000:7.1f} ms", flush=True)
