"""Round-3 experiment: projected SVD with a CARRIED top-subspace.

The cross-period warm START is dead (warmstart_r3_experiment.py: the left
singular BASIS rotates ~completely per period, off 0.98 vs cold 0.28, same
sweep count).  But the downstream two-site update consumes ONLY the top-chi
(S, V) block -- the discarded V columns are never formed into tensors
(core/truncate.py masks them).  So the relevant carrier is the top-chi
right-singular SUBSPACE, which can churn far slower than the basis within
it.  Scheme under test:

  carry Q [n, chi+p] orthonormal ~ top right-subspace of this bond's theta
  from its previous update;
  per period:  Y = (theta^H theta) Q        (2 MXU matmuls, optional)
               Q' = cholqr/ns-orth(Y)       (matmuls)
               P  = theta Q'                [m, chi+p]   (1 matmul)
               U_P, S, W = jacobi_svd(P)    (V-accumulating kernel,
                                            287-step sweeps instead of 511)
               V  = Q' W                    (1 matmul)
  S exact and V exact up to the subspace leak 1 - |theta Q'|^2/|theta|^2
  restricted to the kept block.

Measured here at L=40 chi=256 TRUE steady state (period 40+):
  1. per-bond kept-block leak of the lag-1 subspace, raw and after one
     power iteration, at oversampling p in {0, 32, 64};
  2. top-256 S error of the projected SVD vs exact f64 SVD;
  3. discarded-weight error (what trunc_err would misreport);
  4. realistic f32 carrier: V from jacobi_sv + polish of the previous
     period instead of exact f64 vectors.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_sv

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
    psi = apply_one_site_gates(psi, gates.kick)
    th = capture_even_thetas(psi)
    psi, _ = apply_bond_gates(psi, full_gates.bond_gates, start=0, tp=tp)
    psi, _ = apply_bond_gates(psi, full_gates.bond_gates, start=1, tp=tp)
    return psi, th


thetas = []
for p in range(3):
    psi, th = one_period(psi)
    thetas.append(np.asarray(cpx.to_numpy(th)))
print("captured 3 consecutive even-sweep theta batches", flush=True)

svds = [np.linalg.svd(th) for th in thetas]
print("host SVDs done", flush=True)

rng = np.random.default_rng(7)
th1, th2 = thetas[1], thetas[2]
U2, S2, Vh2 = svds[2]
nb = th1.shape[0]


def orth(Y):
    """Orthonormalize columns (host QR -- stands in for CholQR/NS)."""
    Q, _ = np.linalg.qr(Y)
    return Q


def project_and_svd(theta, Q):
    """Exact projected SVD: P = theta Q; SVD(P); V = Q W."""
    P = theta @ Q
    Up, Sp, Wh = np.linalg.svd(P, full_matrices=False)
    V = Q @ Wh.conj().T
    return Sp, V


def report(tag, Qs):
    """Qs: list of per-bond [n, k] orthonormal carriers."""
    leak_max, serr_max, derr_max = 0.0, 0.0, 0.0
    for b in range(nb):
        th = th2[b]
        Q = Qs[b]
        nrm2 = np.sum(np.abs(th) ** 2)
        leak = 1.0 - np.sum(np.abs(th @ Q) ** 2) / nrm2
        Sp, V = project_and_svd(th, Q)
        serr = np.max(np.abs(Sp[:chi] - S2[b, :chi])) / S2[b, 0]
        # discarded weight as trunc_err would compute it:
        # exact: nrm2 - sum(kept S^2); projected: same formula
        d_exact = nrm2 - np.sum(S2[b, :chi] ** 2)
        d_proj = nrm2 - np.sum(Sp[:chi] ** 2)
        derr = abs(d_proj - d_exact) / nrm2
        leak_max = max(leak_max, leak)
        serr_max = max(serr_max, serr)
        derr_max = max(derr_max, derr)
    print(f"{tag:42s} leak={leak_max:.3e} Serr={serr_max:.3e} "
          f"dErr={derr_max:.3e}", flush=True)


# spectrum shape at the truncation boundary (context for the leak numbers)
print("S[255]/S[0] per bond:", np.round(S2[:, 255] / S2[:, 0], 6)[:8],
      flush=True)
print("kept-weight fraction:",
      np.round([np.sum(S2[b, :chi]**2) / np.sum(S2[b]**2) for b in range(4)],
               9), flush=True)

V1 = [svds[1][2][b].conj().T for b in range(nb)]     # exact f64 V of theta1

for p in (0, 32, 64):
    Qs = []
    for b in range(nb):
        Q = V1[b][:, :chi]
        if p:
            Q = orth(np.concatenate(
                [Q, rng.normal(size=(n, p)) + 1j * rng.normal(size=(n, p))],
                axis=1))
        Qs.append(Q)
    report(f"lag-1 exact V_top, p={p}, no power iter", Qs)
    # one power iteration
    Qs_pow = []
    for b in range(nb):
        Y = th2[b].conj().T @ (th2[b] @ Qs[b])
        Qs_pow.append(orth(Y))
    report(f"lag-1 exact V_top, p={p}, 1 power iter", Qs_pow)

# realistic carrier: f32 kernel output of theta1 (V columns + polish)
S1f, V1f = jacobi_sv(C(jnp.asarray(th1.real, jnp.float32),
                       jnp.asarray(th1.imag, jnp.float32)), polish=chi)
V1f = np.asarray(V1f.re) + 1j * np.asarray(V1f.im)
for p in (32, 64):
    Qs = [orth(np.concatenate(
        [V1f[b][:, :chi],
         rng.normal(size=(n, p)) + 1j * rng.normal(size=(n, p))], axis=1))
        for b in range(nb)]
    report(f"lag-1 f32 kernel V_top, p={p}, no power", Qs)
    Qs_pow = [orth(th2[b].conj().T @ (th2[b] @ Qs[b])) for b in range(nb)]
    report(f"lag-1 f32 kernel V_top, p={p}, 1 power", Qs_pow)

# sanity ceiling: same-period exact top subspace (leak = discarded weight)
Qs = [Vh2[b].conj().T[:, :chi] for b in range(nb)]
report("same-period exact V_top (ceiling)", Qs)
