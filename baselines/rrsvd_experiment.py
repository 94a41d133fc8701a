"""Experiment: reduced-rank randomized SVD for the TEBD truncation.

Idea (PAPERS.md item 3, arXiv:1504.00992): the two-site update keeps only
the top-chi right singular triplets of theta [m, n] = [512, 512].  A
randomized range finder restricts the SVD to an s-dimensional sketch of
the right subspace (s = chi + p oversampling):

  Y0 = theta^H Omega          (Omega [m, s] complex gaussian; MXU matmul)
  Y  <- orth(theta^H (theta Y))  x q subspace iterations (all matmul;
        orth BETWEEN iterations, else small-sigma directions underflow f32)
  B  = theta @ Q              [m, s]
  SVD(B) = U S W^H  via the V-ACCUMULATING jacobi kernel on s columns
        (per-sweep work ~ (s-1) x s x (m + s) element-visits vs the
        production V-free kernel's (n-1) x n x n -- 0.49x at s=288)
  V  = Q W, Vh_top = (Q W)^H, disc = ||theta||_F^2 - sum S^2

Unlike the warm-started projected Jacobi (proj_jacobi_experiment.py --
UNSOUND, one-period subspace leak up to 0.77 norm^2) the sketch is fresh
every call, so there is no stale-subspace failure mode.  The open risk is
the FLAT spectrum at the truncation boundary (sigma_257/sigma_256 ~ 1 at
steady state): capture theory gives missed weight <= (1 + k/(p-1)) x true
discarded weight, so p must be sizable.  This script measures, on REAL
captured steady-state thetas: S error vs LAPACK, kept-subspace residual
vs the true discarded weight, V orthonormality, and wall-clock vs the
production jacobi_sv -- the go/no-go for promoting this to a csvd method.

Run:  python baselines/rrsvd_experiment.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from timecrystal_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from proj_jacobi_experiment import build_theta_batch, evolve_and_capture, host_svd

from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_sv, jacobi_svd

CHI = 256


def ns_orth(X: C, iters: int = 12) -> C:
    """Newton-Schulz orthonormalization of X's columns (all matmul)."""
    s = X.re.shape[-1]
    # prescale into the NS convergence region
    nrm = jnp.sqrt(jnp.sum(cpx.abs2(X), axis=(-2, -1), keepdims=True))
    X = X * (np.float32(np.sqrt(2.0)) / jnp.maximum(nrm, 1e-30))
    eye = jnp.eye(s, dtype=X.re.dtype)
    for _ in range(iters):
        P = cpx.einsum("nji,njk->nik", X.conj(), X)
        corr = C(1.5 * eye[None] - 0.5 * P.re, -0.5 * P.im)
        X = cpx.einsum("nij,njk->nik", X, corr)
    return X


def rrsvd(theta: C, s: int, q: int, n_sweeps: int, key):
    """Randomized top-s SVD: returns (S [.., s], V C[.., n, s])."""
    nb, m, n = theta.re.shape
    k1, k2 = jax.random.split(key)
    Om = C(jax.random.normal(k1, (nb, m, s), theta.dtype),
           jax.random.normal(k2, (nb, m, s), theta.dtype))
    Y = cpx.einsum("nji,njk->nik", theta.conj(), Om)        # theta^H Omega
    Y = ns_orth(Y)
    for _ in range(q):
        Z = cpx.einsum("nij,njk->nik", theta, Y)            # theta Y
        Y = cpx.einsum("nji,njk->nik", theta.conj(), Z)     # theta^H (...)
        Y = ns_orth(Y)
    B = cpx.einsum("nij,njk->nik", theta, Y)                # [nb, m, s]
    U, S, Wh = jacobi_svd(B, n_sweeps=n_sweeps)
    W = C(jnp.swapaxes(Wh.re, -1, -2), -jnp.swapaxes(Wh.im, -1, -2))
    V = cpx.einsum("nij,njk->nik", Y, W)                    # [nb, n, s]
    return S, V


def main():
    chi = CHI
    print(f"capturing steady-state thetas (period 25, L=40 chi={chi})...")
    M_prev, M_cur = evolve_and_capture()
    nb, m, n = M_cur.re.shape
    print(f"theta batch: [{nb}, {m}, {n}]")

    _, S_true, Vh_true = host_svd(M_cur)
    Mc = np.asarray(M_cur.re, np.float64) + 1j * np.asarray(M_cur.im)
    true_disc = np.sum(S_true[:, chi:] ** 2, axis=1)
    norm2 = np.sum(S_true ** 2, axis=1)
    print(f"true disc/norm2: median={np.median(true_disc / norm2):.3e} "
          f"max={(true_disc / norm2).max():.3e}")

    def fetch(x):
        return np.asarray(x)

    # production path
    prod = jax.jit(lambda th: jacobi_sv(
        C(jnp.swapaxes(th.re, -1, -2), -jnp.swapaxes(th.im, -1, -2)),
        polish=chi))
    S_p, V_p = prod(M_cur)
    fetch(S_p)
    t0 = time.time()
    for _ in range(5):
        S_p, V_p = prod(M_cur)
    fetch(S_p)
    t_prod = (time.time() - t0) / 5
    err_p = np.max(np.abs(fetch(S_p)[:, :chi] - S_true[:, :chi])
                   / S_true[:, :1])
    print(f"\nproduction jacobi_sv: {t_prod * 1e3:7.1f} ms  S err={err_p:.2e}")

    key = jax.random.PRNGKey(0)
    for s in (288, 320, 384):
        for q_it in (1, 2):
            for sw in (8, 10):
                f = jax.jit(lambda th, k, s=s, q=q_it, sw=sw:
                            rrsvd(th, s, q, sw, k))
                S_r, V_r = f(M_cur, key)
                fetch(S_r)
                t0 = time.time()
                for _ in range(5):
                    S_r, V_r = f(M_cur, key)
                fetch(S_r)
                t_r = (time.time() - t0) / 5
                S_np = fetch(S_r)
                err = np.max(np.abs(S_np[:, :chi] - S_true[:, :chi])
                             / S_true[:, :1])
                # kept-subspace residual vs the true discarded weight
                Vr = (fetch(V_r.re).astype(np.complex128)
                      + 1j * fetch(V_r.im))[:, :, :chi]
                MV = Mc @ Vr
                res = norm2 - np.sum(np.abs(MV) ** 2, axis=(1, 2))
                infl = np.median(res / np.maximum(true_disc, 1e-30))
                # V orthonormality over kept columns
                G = np.einsum("nji,njk->nik", Vr.conj(), Vr)
                orth = np.abs(G - np.eye(chi)[None]).max()
                print(f"rrsvd s={s} q={q_it} sweeps={sw}: {t_r * 1e3:7.1f} ms"
                      f"  S err={err:.2e}  missed/true-disc med={infl:.2f}"
                      f"  V orth err={orth:.2e}")


if __name__ == "__main__":
    main()
