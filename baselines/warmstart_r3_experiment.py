"""Round-3 warm-start experiment: can the previous period's U precondition
the one-sided Jacobi kernel at steady state?

Background: at L=40 chi=256 steady state BOTH batched jacobi_sv calls hit
max_sweeps=12 without fully converging (off2 3e-15 vs target 9e-16), so the
SVD is ~2x197 ms of a ~410 ms period.  The round-2 PROJECTED warm start
(rank-truncated V_prev) was unsound (subspace leak 0.77 on rank-deficient
bonds).  Here we test the LEAK-FREE full-basis version: one-sided Jacobi on
B = theta^H . W with W = U(theta_prev) (a full unitary -- no leak by
construction; B = V S (U^H W) has the SAME S and V as theta^H).  If the
singular subspaces rotate slowly across periods, B starts near-orthogonal
and the kernel needs far fewer sweeps.

Also measured: S error vs f64 LAPACK at fixed sweep counts (is 12 even
needed?), and the period-2 (DTC-flip) warm start variant.
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
from timecrystal_tpu.ops.pallas.jacobi_svd import (_jacobi_sweep_kernel,
                                                   _pick_block, jacobi_sv)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def one_period(psi):
    """Advance one merged period, returning (psi_next, theta_even)."""
    psi = apply_one_site_gates(psi, gates.kick)
    th = capture_even_thetas(psi)
    psi, _ = apply_bond_gates(psi, full_gates.bond_gates, start=0, tp=tp)
    psi, _ = apply_bond_gates(psi, full_gates.bond_gates, start=1, tp=tp)
    return psi, th


thetas = []
for p in range(4):
    psi, th = one_period(psi)
    thetas.append(np.asarray(cpx.to_numpy(th)))   # complex128 numpy
print("captured 4 consecutive even-sweep theta batches", flush=True)


# ---- f64 host SVDs for exact U, S --------------------------------------
svds = []
for th in thetas:
    U, S, Vh = np.linalg.svd(th)
    svds.append((U, S, Vh))
print("host SVDs done", flush=True)


def gram_off(Bm):
    """max off-diagonal |<ci,cj>| / sigma_max^2 over the batch (the kernel's
    convergence measure, computed exactly)."""
    worst = 0.0
    for k in range(Bm.shape[0]):
        G = Bm[k].conj().T @ Bm[k]
        smax2 = np.max(np.abs(np.diag(G)))
        off = np.max(np.abs(G - np.diag(np.diag(G))))
        worst = max(worst, off / smax2)
    return worst


# cold vs warm initial off-diagonal
A2 = thetas[2].conj().transpose(0, 2, 1)          # A = theta^H at period p
U1 = svds[1][0]                                    # U of period p-1
U0 = svds[0][0]                                    # U of period p-2
print(f"cold    off: {gram_off(A2):.3e}", flush=True)
print(f"warm p-1 off: {gram_off(A2 @ U1):.3e}", flush=True)
print(f"warm p-2 off: {gram_off(A2 @ U0):.3e}", flush=True)
print(f"sanity same-period off: {gram_off(A2 @ svds[2][0]):.3e}", flush=True)


# ---- kernel sweep counts, cold vs warm ---------------------------------
@partial(jax.jit, static_argnames=("max_sweeps", "tol"))
def sweep_count(A, max_sweeps=16, tol=3e-8):
    """A: C[B, n, n] already transposed input (columns to orthogonalize).
    Returns (sweeps_used, final off2, orthogonalized B matrix)."""
    Bn0, m, nn = A.re.shape
    per_mat_bytes = (10 * m * nn) * np.dtype(A.dtype).itemsize
    G = _pick_block(Bn0, per_mat_bytes, 50 * 2**20)
    pad = (-Bn0) % G
    if pad:
        A = C(jnp.concatenate([A.re, jnp.zeros((pad, m, nn), A.dtype)]),
              jnp.concatenate([A.im, jnp.zeros((pad, m, nn), A.dtype)]))
    Bn = Bn0 + pad
    kernel = _jacobi_sweep_kernel(nn)
    n_blocks = Bn // G
    out_shape = [jax.ShapeDtypeStruct((Bn, m, nn), A.dtype),
                 jax.ShapeDtypeStruct((Bn, m, nn), A.dtype),
                 jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32)]
    block = pl.BlockSpec((G, m, nn), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    off2_spec = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    sweep_call = pl.pallas_call(
        kernel, grid=(n_blocks,), out_shape=out_shape,
        in_specs=[block, block], out_specs=[block, block, off2_spec],
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[pltpu.VMEM((G, 3, nn // 2), A.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    def cond(carry):
        s, off2, _, _ = carry
        return (s < max_sweeps) & (off2 >= np.float32(tol * tol))

    def body(carry):
        s, _, re, im = carry
        re, im, off2b = sweep_call(re, im)
        return (s + 1, jnp.max(off2b), re, im)

    s, off2, B_re, B_im = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.float32(jnp.inf), A.re, A.im))
    return s, off2, C(B_re[:Bn0], B_im[:Bn0])


def s_err(Bm, S_ref):
    """max over batch of max |S - S_ref| / sigma_max."""
    S = np.sqrt(np.sum(np.abs(Bm) ** 2, axis=-2))
    S = -np.sort(-S, axis=-1)
    return float(np.max(np.abs(S - S_ref[:, :S.shape[-1]])
                        / S_ref[:, :1]))


def run_case(name, A_np):
    A = C(jnp.asarray(A_np.real, jnp.float32), jnp.asarray(A_np.imag, jnp.float32))
    s, off2, Bm = sweep_count(A)
    Bm_np = np.asarray(Bm.re) + 1j * np.asarray(Bm.im)
    err = s_err(Bm_np, svds[2][1])
    print(f"{name:24s} sweeps={int(s):2d} off2={float(off2):.2e} "
          f"Serr={err:.2e}", flush=True)


run_case("cold", A2)
run_case("warm p-1 (exact U)", A2 @ U1)
run_case("warm p-2 (exact U)", A2 @ U0)

# realistic warm start: U from the f32 kernel's own output of period p-1
# (theta_prev V S^-1 with junk-column completion via the identity fallback)
S1, V1 = jacobi_sv(C(jnp.asarray(thetas[1].real, jnp.float32),
                     jnp.asarray(thetas[1].imag, jnp.float32)), polish=chi)
S1n, V1n = np.asarray(S1), np.asarray(V1.re) + 1j * np.asarray(V1.im)
th1 = thetas[1]
inv = np.where(S1n > 1e-4 * S1n[:, :1], 1.0 / np.maximum(S1n, 1e-30), 0.0)
U1_f32 = th1 @ V1n * inv[:, None, :]
# completion: junk columns left zero -> W not unitary there; measure how
# much that costs in practice (those directions carry sigma ~< 1e-4 smax)
run_case("warm p-1 (f32 U, 0fill)", A2 @ U1_f32)

# fixed-sweep S error table on the cold case (is max_sweeps=12 needed?)
A2j = C(jnp.asarray(A2.real, jnp.float32), jnp.asarray(A2.imag, jnp.float32))
for ms in (6, 8, 9, 10, 12, 14, 16):
    s, off2, Bm = sweep_count(A2j, max_sweeps=ms, tol=1e-30)
    Bm_np = np.asarray(Bm.re) + 1j * np.asarray(Bm.im)
    print(f"cold fixed {ms:2d} sweeps: off2={float(off2):.2e} "
          f"Serr={s_err(Bm_np, svds[2][1]):.2e}", flush=True)
