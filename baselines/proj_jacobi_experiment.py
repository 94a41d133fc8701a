"""Experiment: warm-started PROJECTED Jacobi SVD for the TEBD truncation.

Idea (QR-TEBD class, PAPERS.md item 1, arXiv:2212.09782): the two-site
update keeps only the top-chi right singular triplets of the chi*d x d*chi
theta.  The kept right-subspace rotates slowly between consecutive
same-bond updates, so instead of a full one-sided Jacobi on theta^H
(n=512 columns) we can:

  1. project  P = M . V_prev            (one MXU matmul, P [512, 256])
  2. SVD(P) = U S W^H with one-sided Jacobi rotating P's 256 columns and
     accumulating W [256, 256]  -->  per-sweep VMEM traffic is
     (512.256^2 + 256^3)/512^3 = 0.375x the production kernel's, and the
     warm start (W ~ I) should cut the sweep count too
  3. V = V_prev . W,  Vh_top = (V)^H    (one MXU matmul)

The subspace leakage ||M||_F^2 - ||M V_prev||_F^2 exceeds the true
discarded weight sum_{i>chi} sigma_i^2 by the weight that rotated out of
span(V_prev) in one period -- this script measures whether that excess is
at the truncation-error level (method sound) or above it (method unsound),
plus wall-clock for each variant on the real TPU.

Run:  python baselines/proj_jacobi_experiment.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from timecrystal_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from timecrystal_tpu.core.mps import apply_one_site_gates, create_initial_state
from timecrystal_tpu.core.truncate import TruncParams, apply_bond_gates
from timecrystal_tpu.models.kicked_ising import (FloquetGates,
                                                 _square_diagonal_gates,
                                                 draw_disorder_reference,
                                                 make_floquet_gates)
from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_sv, jacobi_svd

CFG = dict(L=40, chi=256, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
T_CAPTURE = 25          # steady chi saturation by ~period 12


def build_theta_batch(psi, bond_gates, start):
    """Mirror of truncate.apply_bond_gates's theta construction."""
    L, chi, d, _ = psi.B.re.shape
    idx_np = np.arange(start, L - 1, 2)
    idx = jnp.asarray(idx_np)
    Bl = psi.B[idx]
    Br = psi.B[idx + 1]
    lamL = psi.lam[idx]
    g = bond_gates[idx]
    theta_tilde = cpx.einsum("napb,nbqc->napqc", Bl, Br)
    theta_tilde = cpx.einsum("npqrs,narsc->napqc", g, theta_tilde)
    theta = theta_tilde * lamL[:, :, None, None, None]
    n = len(idx_np)
    return theta.reshape(n, chi * d, d * chi)


def evolve_and_capture():
    """Run the production merged-frame evolution; return (M_prev, M_cur):
    the even-bond theta batches at periods T_CAPTURE-1 and T_CAPTURE."""
    h_fields = draw_disorder_reference(CFG["L"], CFG["h"], CFG["seed"])
    gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32),
                               CFG["tau"], theta=CFG["theta_frac"] * np.pi,
                               dtype=jnp.float32)
    full = FloquetGates(bond_gates=_square_diagonal_gates(gates.bond_gates),
                        kick=gates.kick)
    psi = create_initial_state(CFG["L"], "neel", chi=CFG["chi"],
                               dtype=jnp.float32)
    tp = TruncParams(chi_max=0, svd_min=1e-7)

    @jax.jit
    def kick_even(phi):
        phi = apply_one_site_gates(phi, full.kick)
        M_e = build_theta_batch(phi, full.bond_gates, 0)
        phi, _ = apply_bond_gates(phi, full.bond_gates, start=0, tp=tp)
        phi, _ = apply_bond_gates(phi, full.bond_gates, start=1, tp=tp)
        return phi, M_e

    M_prev = M_cur = None
    for t in range(T_CAPTURE + 1):
        psi, M_e = kick_even(psi)
        if t == T_CAPTURE - 1:
            M_prev = M_e
        elif t == T_CAPTURE:
            M_cur = M_e
    return M_prev, M_cur


def host_svd(M):
    Mc = (np.asarray(M.re, np.float64) + 1j * np.asarray(M.im, np.float64))
    U, S, Vh = np.linalg.svd(Mc, full_matrices=False)
    return U, S, Vh


def fetch(x):
    return np.asarray(x)


def main():
    chi = CFG["chi"]
    print(f"capturing thetas at periods {T_CAPTURE-1},{T_CAPTURE} "
          f"(L={CFG['L']}, chi={chi}, theta=0.9pi)...")
    M_prev, M_cur = evolve_and_capture()
    nb, m, n = M_prev.re.shape
    print(f"theta batch: [{nb}, {m}, {n}]")

    _, S_prev, Vh_prev = host_svd(M_prev)
    _, S_true, Vh_true = host_svd(M_cur)
    true_disc = np.sum(S_true[:, chi:] ** 2, axis=1)          # [nb]
    norm2 = np.sum(S_true ** 2, axis=1)
    print(f"true spectrum: sigma_max={S_true[:, 0].max():.3e} "
          f"sigma_chi={S_true[:, chi-1].max():.3e} "
          f"true disc/norm2: median={np.median(true_disc/norm2):.3e} "
          f"max={(true_disc/norm2).max():.3e}")

    # ---- subspace leakage with V_prev from the previous period (f64 best case)
    V_prev = np.conj(np.transpose(Vh_prev[:, :chi, :], (0, 2, 1)))  # [nb,n,chi]
    Mc = (np.asarray(M_cur.re, np.float64) + 1j * np.asarray(M_cur.im))
    P = Mc @ V_prev                                           # [nb, m, chi]
    cap2 = np.sum(np.abs(P) ** 2, axis=(1, 2))
    leak = norm2 - cap2                                       # >= true_disc
    excess = leak - true_disc
    print("\nsubspace leakage (V_prev = exact top-chi right vectors, 1 period old):")
    print(f"  leak/norm2:        median={np.median(leak/norm2):.3e} max={(leak/norm2).max():.3e}")
    print(f"  true disc/norm2:   median={np.median(true_disc/norm2):.3e}")
    print(f"  EXCESS/norm2:      median={np.median(excess/norm2):.3e} max={(excess/norm2).max():.3e}")
    print(f"  excess/true_disc:  median={np.median(excess/np.maximum(true_disc,1e-30)):.2f}")

    # ---- with one cholesky-QR power-iteration refresh: Q = orth(G V_prev)
    G = np.conj(np.transpose(Mc, (0, 2, 1))) @ Mc
    Y = G @ V_prev
    # QR per matrix (host, f64 -- just measuring achievable capture)
    Qr = np.stack([np.linalg.qr(Y[i])[0] for i in range(nb)])
    Pq = Mc @ Qr
    cap2q = np.sum(np.abs(Pq) ** 2, axis=(1, 2))
    leakq = norm2 - cap2q
    excq = leakq - true_disc
    print("after ONE power-iteration refresh Q = orth(G V_prev):")
    print(f"  EXCESS/norm2:      median={np.median(excq/norm2):.3e} max={(excq/norm2).max():.3e}")

    # ================= timing on device =================
    dev_backend = jax.default_backend()
    print(f"\nbackend: {dev_backend}")

    thetaH = C(jnp.swapaxes(M_cur.re, -1, -2), -jnp.swapaxes(M_cur.im, -1, -2))

    # production path: adaptive V-free jacobi_sv on theta^H
    prod = jax.jit(lambda th: jacobi_sv(th, polish=chi))
    S_p, V_p = prod(thetaH)
    fetch(S_p)
    t0 = time.time()
    for _ in range(5):
        S_p, V_p = prod(thetaH)
    fetch(S_p.re if hasattr(S_p, "re") else S_p)
    t_prod = (time.time() - t0) / 5
    S_p_np = fetch(S_p)
    err_prod = np.max(np.abs(S_p_np[:, :chi] - S_true[:, :chi]) / S_true[:, :1])
    print(f"production jacobi_sv(theta^H):       {t_prod*1e3:7.1f} ms  "
          f"S err={err_prod:.2e}")

    # projected path: P = M V_prev ; jacobi_svd(P) ; V = V_prev W
    Vp_dev = C(jnp.asarray(np.real(V_prev), jnp.float32),
               jnp.asarray(np.imag(V_prev), jnp.float32))

    def proj_path(M, Vp, n_sweeps):
        P = cpx.einsum("nij,njk->nik", M, Vp)
        U, S, Wh = jacobi_svd(P, n_sweeps=n_sweeps)
        W = C(jnp.swapaxes(Wh.re, -1, -2), -jnp.swapaxes(Wh.im, -1, -2))
        V = cpx.einsum("nij,njk->nik", Vp, W)
        return S, V

    for s in (4, 6, 8, 10):
        pj = jax.jit(lambda M, Vp, s=s: proj_path(M, Vp, s))
        S_j, V_j = pj(M_cur, Vp_dev)
        fetch(S_j)
        t0 = time.time()
        for _ in range(5):
            S_j, V_j = pj(M_cur, Vp_dev)
        fetch(S_j)
        t_pj = (time.time() - t0) / 5
        S_j_np = fetch(S_j)
        err = np.max(np.abs(S_j_np[:, :chi] - S_true[:, :chi]) / S_true[:, :1])
        # subspace residual of the returned V (vs capture ceiling `leak`)
        Vj = fetch(V_j.re).astype(np.complex128) + 1j * fetch(V_j.im)
        MV = Mc @ Vj[:, :, :chi]
        res = norm2 - np.sum(np.abs(MV) ** 2, axis=(1, 2))
        print(f"projected jacobi_svd(P), {s:2d} sweeps: {t_pj*1e3:7.1f} ms  "
              f"S err={err:.2e}  resid/norm2 med={np.median(res/norm2):.2e}")

    # ---- on-device refresh, all f32, no Gram squaring:
    #   U~ = colnorm(M V_prev)  (columns ~ u_i, norms sigma_i)
    #   Y  = colnorm(M^H U~)    (columns ~ v_i of the CURRENT M)
    #   Q  = ns_orth(Y)         (near-orthonormal start -> few iters)
    # colnorm masks columns below rel_tol * max_norm to exact zero
    # (rank-deficient capture; zero columns are Jacobi/truncation-safe).
    def colnorm_masked(Y, rel_tol):
        nrm = jnp.sqrt(jnp.sum(cpx.abs2(Y), axis=-2, keepdims=True))
        keep = nrm > rel_tol * jnp.max(nrm, axis=-1, keepdims=True)
        inv = jnp.where(keep, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
        return Y * inv

    def ns_orth_batched(X, iters):
        k = X.re.shape[-1]
        eye = jnp.eye(k, dtype=X.re.dtype)
        for _ in range(iters):
            Pk = cpx.einsum("nji,njk->nik", X.conj(), X)
            corr = C(1.5 * eye[None] - 0.5 * Pk.re, -0.5 * Pk.im)
            X = cpx.einsum("nij,njk->nik", X, corr)
        return X

    def refreshed_path(M, Vp, n_sweeps, orth_iters, rel_tol=4e-7):
        MV = cpx.einsum("nij,njk->nik", M, Vp)                  # [n, m, chi]
        Ut = colnorm_masked(MV, rel_tol)
        Y = cpx.einsum("nji,njk->nik", M.conj(), Ut)            # ~ sigma_i v_i
        Q = ns_orth_batched(colnorm_masked(Y, rel_tol), orth_iters)
        P = cpx.einsum("nij,njk->nik", M, Q)
        U, S, Wh = jacobi_svd(P, n_sweeps=n_sweeps)
        W = C(jnp.swapaxes(Wh.re, -1, -2), -jnp.swapaxes(Wh.im, -1, -2))
        V = cpx.einsum("nij,njk->nik", Q, W)
        return S, V

    print()
    for orth_iters in (4, 8):
        for s in (4, 6, 10):
            pj = jax.jit(lambda M, Vp, s=s, o=orth_iters:
                         refreshed_path(M, Vp, s, o))
            S_j, V_j = pj(M_cur, Vp_dev)
            fetch(S_j)
            t0 = time.time()
            for _ in range(5):
                S_j, V_j = pj(M_cur, Vp_dev)
            fetch(S_j)
            t_pj = (time.time() - t0) / 5
            S_j_np = fetch(S_j)
            err = np.max(np.abs(S_j_np[:, :chi] - S_true[:, :chi])
                         / S_true[:, :1])
            Vj = fetch(V_j.re).astype(np.complex128) + 1j * fetch(V_j.im)
            MV2 = Mc @ Vj[:, :, :chi]
            res = norm2 - np.sum(np.abs(MV2) ** 2, axis=(1, 2))
            # orthonormality of returned V over its NONZERO columns
            # (masked rank-deficient columns are exact zeros by design)
            orth_err = 0.0
            for i in range(nb):
                nz = np.linalg.norm(Vj[i], axis=0) > 0.5
                Vi = Vj[i][:, nz]
                if Vi.shape[1] == 0:
                    continue
                orth_err = max(orth_err,
                               np.abs(np.conj(Vi.T) @ Vi
                                      - np.eye(Vi.shape[1])).max())
            print(f"refreshed(o={orth_iters:2d}) jacobi(P) {s:2d} sweeps: "
                  f"{t_pj*1e3:7.1f} ms  S err={err:.2e}  "
                  f"resid/norm2 max={np.max(res/norm2):.2e}  "
                  f"V orth err={orth_err:.2e}")


if __name__ == "__main__":
    main()
