"""Experiment: CORE-MATRIX projected SVD vs the shipped chained
``jacobi_proj`` (PERFORMANCE.md round-3).

Idea under test (the ROADMAP's "all-matmul inner eigensolver" lever,
reshaped): the chained scheme spends its time in TWO Jacobi runs on
[2chi, chi] panels -- step 2 (orthonormalize T = theta Q0, full-ish
sweeps: the basis is generic) and step 4 (few sweeps: Y is
singular-aligned).  A plain polynomial polar CANNOT replace step 2
one-for-one (its output basis is unaligned, which would push the full
sweep cost into step 4).  But it CAN build both subspace bases, after
which ONE Jacobi on the small k x k core matrix does all the aligning:

  1. T = theta Q0            [m, k]   (fixed generic basis, as shipped)
  2. W = poly_polar(T)       [m, k]   (quintic Newton-Schulz, all MXU
                                       matmuls; p(0) = 0 so exact-zero
                                       directions stay zero -- benign on
                                       rank deficiency, unlike the
                                       Loewdin (X^H X)^{-1/2} NS-orth
                                       that died in the rrsvd experiment)
  3. Y = theta^H W           [n, k]   (second power application: right-
                                       subspace capture, tail-bound leak)
  4. Z = poly_polar(Y)       [n, k]
  5. P = theta Z             [m, k]
     (variant 'herm': W <- poly_polar(P) -- third application, both
      subspaces then carry >= 2 power steps and K is Hermitian PSD)
  6. K = W^H P               [k, k]   (sigma-weighted restriction: NO
                                       Gram squaring, boundary sigmas
                                       stay f32-resolvable)
  7. jacobi(K^H) -> S, Vk    (the ONLY rotation kernel: 255-step
                              tournament on k-row columns = HALF the
                              VMEM rotation bytes per sweep of a
                              [2chi, chi] panel)
  8. V = Z Vk (+ NS polish)  -- downstream consumes (S, V) only.

Rotation-byte accounting at chi=256 (the VMEM-bandwidth-bound cost):
shipped = (sweeps_b + sweeps_d) x [512, 256]; core = sweeps_K x
[256, 256] = 0.5x per sweep.  If sweeps_K ~ sweeps_b + sweeps_d (both
start from a generic basis) the rotation traffic halves; the polar
iterations are ~15 x 3 complex [*, k] matmuls = MXU work that the
rotation kernel cannot use.

Accuracy gates (same bar as chained_proj_experiment.py):
  - S err class <= ~2e-5 (the shipped tuned config's class) on captured
    steady-state thetas;
  - kept-weight misplacement ~1e-6 class;
  - V column orthonormality residual at the f32 floor.

Run on the TPU host:  python baselines/polar_core_experiment.py
CPU correctness mode: TCT_CORE_CPU=1 python baselines/polar_core_experiment.py
  (small synthetic steep-spectrum batch, interpret-mode kernels)
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import numpy as np

CPU_MODE = bool(os.environ.get("TCT_CORE_CPU"))
if CPU_MODE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

from timecrystal_tpu.utils.cache import enable_compilation_cache

if not CPU_MODE:
    enable_compilation_cache()

from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.pallas.jacobi_svd import (_cols_to_sv,
                                                   _fixed_projection_basis,
                                                   _ns_polish,
                                                   _orthogonalize_columns,
                                                   jacobi_proj, jacobi_sv)

# Muon-class quintic coefficients: p(x) = a x + b x^3 + c x^5 maps (0, 1]
# toward 1 with slope a at 0 (small sigmas grow ~3.4x per iteration) while
# |p| stays <= ~1.09 on [0, 1.09]; a cubic NS tail (1.5, -0.5) then
# contracts the band quadratically to the dtype floor.
_QA, _QB, _QC = 3.4445, -4.7750, 2.0315


def poly_polar(X: C, q_iters: int = 14, c_iters: int = 6) -> C:
    """Polynomial polar orthonormalization of X C[B, m, k] (all matmuls).

    Returns W with W^H W ~ I on the span of X's non-null directions;
    exact zero singular values stay exactly zero (p(0) = 0).
    """
    # Frobenius prescale guarantees sigma_max <= 1 (costs ~log3.4(sqrt(k))
    # extra quintic iterations in the worst case, which is cheap)
    nrm = jnp.sqrt(jnp.sum(cpx.abs2(X), axis=(-2, -1), keepdims=True))
    inv = jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
    W = C(X.re * inv, X.im * inv)
    k = X.re.shape[-1]
    eye = jnp.eye(k, dtype=X.dtype)
    for _ in range(q_iters):
        G = cpx.einsum("...ji,...jk->...ik", W.conj(), W)
        G2 = cpx.einsum("...ij,...jk->...ik", G, G)
        coef = C(_QA * eye + _QB * G.re + _QC * G2.re,
                 _QB * G.im + _QC * G2.im)
        W = cpx.einsum("...ij,...jk->...ik", W, coef)
    for _ in range(c_iters):
        G = cpx.einsum("...ji,...jk->...ik", W.conj(), W)
        coef = C(1.5 * eye - 0.5 * G.re, -0.5 * G.im)
        W = cpx.einsum("...ij,...jk->...ik", W, coef)
    return W


@partial(jax.jit, static_argnames=("k", "variant", "q_iters", "c_iters",
                                   "max_sweeps", "tol", "polish_iters",
                                   "interpret"))
def jacobi_core(theta: C, k: int, variant: str = "plain",
                q_iters: int = 14, c_iters: int = 6,
                max_sweeps: int = 12, tol: float = 1e-6,
                polish_iters: int = 4, interpret: bool = False):
    """Core-matrix projected top-k SVD: (S [.., k], V C[.., n, k], disc)."""
    squeeze = theta.ndim == 2
    if squeeze:
        theta = C(theta.re[None], theta.im[None])
    Bn, m, n = theta.re.shape
    Q0 = _fixed_projection_basis(n, k, theta.dtype)
    T = cpx.einsum("bmn,nk->bmk", theta, Q0)
    W = poly_polar(T, q_iters, c_iters)
    Y = cpx.einsum("bmn,bmk->bnk", theta.conj(), W)
    Z = poly_polar(Y, q_iters, c_iters)
    P = cpx.einsum("bmn,bnk->bmk", theta, Z)
    if variant == "herm":
        W = poly_polar(P, q_iters, c_iters)
    K = cpx.einsum("bmk,bml->bkl", W.conj(), P)
    Kh = C(jnp.swapaxes(K.re, -1, -2), -jnp.swapaxes(K.im, -1, -2))
    Km = _orthogonalize_columns(Kh, max_sweeps, tol, interpret)
    S, Vk = _cols_to_sv(Km, polish=0)
    V = cpx.einsum("bnk,bkl->bnl", Z, Vk)
    if polish_iters:
        V = _ns_polish(V, k, iters=polish_iters)
    disc = jnp.sum(cpx.abs2(theta), axis=(-2, -1)) - jnp.sum(S * S, axis=-1)
    disc = jnp.maximum(disc, 0.0)
    if squeeze:
        S, V, disc = S[0], V[0], disc[0]
    return S, V, disc


def _synthetic_batch(B, m, n, rng, steep=3.6e-5, dtype=np.float32):
    """TEBD-like steep-spectrum complex batch (sigma log-spaced to
    ``steep`` x sigma_max, Haar-ish factors)."""
    out_re = np.empty((B, m, n), dtype)
    out_im = np.empty((B, m, n), dtype)
    S_true = np.empty((B, min(m, n)))
    for b in range(B):
        U, _ = np.linalg.qr(rng.standard_normal((m, m))
                            + 1j * rng.standard_normal((m, m)))
        V, _ = np.linalg.qr(rng.standard_normal((n, n))
                            + 1j * rng.standard_normal((n, n)))
        s = np.logspace(0, np.log10(steep), min(m, n))
        A = (U[:, :min(m, n)] * s) @ V[:min(m, n)].conj().T
        out_re[b], out_im[b] = A.real.astype(dtype), A.imag.astype(dtype)
        S_true[b] = s
    return C(jnp.asarray(out_re), jnp.asarray(out_im)), S_true


def _check(tag, S, V, Mc, k):
    """Error report: S vs f64 LAPACK, kept-weight misplacement, V orth."""
    S = np.asarray(S, np.float64)
    Vc = np.asarray(V.re, np.float64) + 1j * np.asarray(V.im, np.float64)
    S_true = np.linalg.svd(Mc, compute_uv=False)
    s_err = np.max(np.abs(S[:, :k] - S_true[:, :k]) / S_true[:, :1])
    # kept weight through the computed V vs the optimal top-k weight
    w_opt = np.sum(S_true[:, :k] ** 2, axis=1)
    w_got = np.array([np.linalg.norm(Mc[b] @ Vc[b], "fro") ** 2
                      for b in range(Mc.shape[0])])
    w_mis = np.max((w_opt - w_got) / np.sum(S_true ** 2, axis=1))
    orth = max(np.abs(Vc[b].conj().T @ Vc[b]
                      - np.eye(k)).max() for b in range(Mc.shape[0]))
    print(f"{tag:46s} S err={s_err:.2e}  kept-w mis={w_mis:+.2e}  "
          f"V orth={orth:.2e}", flush=True)
    return s_err, w_mis, orth


def cpu_correctness():
    print("== CPU correctness (interpret kernels, n=64, k=32) ==",
          flush=True)
    rng = np.random.default_rng(7)
    M, _ = _synthetic_batch(4, 64, 64, rng, steep=1e-5)
    Mc = np.asarray(M.re, np.float64) + 1j * np.asarray(M.im, np.float64)
    for variant in ("plain", "herm"):
        S, V, disc = jacobi_core(M, 32, variant=variant, interpret=True)
        _check(f"jacobi_core[{variant}]", S, V, Mc, 32)
    S, V, disc = jacobi_proj(M, 32, polish=32, interpret=True)
    _check("jacobi_proj (shipped)", S, V, Mc, 32)
    # rank-deficient input: zero out the bottom half of the spectrum
    rngd = np.random.default_rng(8)
    Md, _ = _synthetic_batch(2, 64, 64, rngd, steep=1e-2)
    Mdc = (np.asarray(Md.re, np.float64)
           + 1j * np.asarray(Md.im, np.float64))
    Ud, sd, Vhd = np.linalg.svd(Mdc)
    sd[:, 20:] = 0.0
    Mdc = np.einsum("bij,bj,bjk->bik", Ud[:, :, :64], sd, Vhd)
    Md = C(jnp.asarray(Mdc.real.astype(np.float32)),
           jnp.asarray(Mdc.imag.astype(np.float32)))
    for variant in ("plain", "herm"):
        S, V, _ = jacobi_core(Md, 32, variant=variant, interpret=True)
        _check(f"rank-20 input, jacobi_core[{variant}]", S, V, Mdc, 32)


def tpu_bench():
    from timecrystal_tpu.core.mps import (apply_one_site_gates,
                                          create_initial_state)
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
    from timecrystal_tpu.models.kicked_ising import (
        FloquetGates, _square_diagonal_gates, draw_disorder_reference,
        make_floquet_gates)

    L, chi = 40, 256
    h_fields = draw_disorder_reference(L, 0.3, 42)
    gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32), 1.0,
                               theta=0.9 * np.pi, dtype=jnp.float32)
    full_gates = FloquetGates(
        bond_gates=_square_diagonal_gates(gates.bond_gates),
        kick=gates.kick)
    tp = TruncParams(chi_max=0, svd_min=1e-7)
    psi = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
    print("settling 40 periods...", flush=True)
    psi, _ = evolve_floquet_scan(psi, gates, 40, tp, frame="merged")
    np.asarray(psi.lam)

    idx = np.arange(0, L - 1, 2)
    psi = apply_one_site_gates(psi, gates.kick)
    Bl = psi.B[jnp.asarray(idx)]
    Br = psi.B[jnp.asarray(idx + 1)]
    lamL = psi.lam[jnp.asarray(idx)]
    gg = full_gates.bond_gates[jnp.asarray(idx)]
    tt = cpx.einsum("napb,nbqc->napqc", Bl, Br)
    tt = cpx.einsum("npqrs,narsc->napqc", gg, tt)
    theta = (tt * lamL[:, :, None, None, None]).reshape(
        len(idx), chi * 2, 2 * chi)
    M = C(jnp.asarray(np.asarray(theta.re)), jnp.asarray(np.asarray(theta.im)))
    Mc = np.asarray(M.re, np.float64) + 1j * np.asarray(M.im, np.float64)
    print(f"theta batch: {M.re.shape}", flush=True)

    def bench(tag, f, *args):
        out = f(*args)
        np.asarray(out[0])
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = f(*args)
        np.asarray(out[0])
        dt = (time.time() - t0) / reps
        print(f"{tag:46s} {dt * 1e3:7.1f} ms", flush=True)
        _check("  " + tag, out[0], out[1], Mc, chi)
        return dt

    prod = jax.jit(lambda th: jacobi_sv(
        C(jnp.swapaxes(th.re, -1, -2), -jnp.swapaxes(th.im, -1, -2)),
        polish=chi))

    def prod_sv(th):
        S, V = prod(th)
        return S[..., :chi], C(V.re[..., :chi], V.im[..., :chi])

    bench("production jacobi_sv", prod_sv, M)
    shipped = jax.jit(lambda th: jacobi_proj(
        th, chi, tol=1e-6, tol_b=1e-6, polish=chi,
        polish_b_iters=4, polish_iters=4))
    bench("jacobi_proj tuned (shipped)", shipped, M)
    for variant in ("plain", "herm"):
        for q, c in ((14, 6), (10, 4), (18, 8)):
            f = jax.jit(lambda th, v=variant, q=q, c=c: jacobi_core(
                th, chi, variant=v, q_iters=q, c_iters=c))
            bench(f"jacobi_core[{variant}] q={q} c={c}", f, M)


if __name__ == "__main__":
    if CPU_MODE:
        cpu_correctness()
    else:
        tpu_bench()
