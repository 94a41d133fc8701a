"""Experiment: cost anatomy of ``jacobi_core`` + mixed-precision polar.

The shipped steady path (ops/pallas/jacobi_svd.jacobi_core, 41 ms per
20-bond batch at L=40 chi=256) splits into (a) the polynomial-polar
pipeline (all MXU matmuls at precision=highest -- 6 bf16 passes per f32
matmul) and (b) ONE Jacobi rotation run on the k x k core (VMEM-
bandwidth-bound).  This experiment measures the split and tests the
cheapest lever on (a):

  MIXED-PRECISION QUINTIC STAGE.  The quintic Newton-Schulz iterations
  only need to GROW small singular values toward 1 -- the span of W is
  exactly preserved by right-multiplication (W <- W @ coef keeps
  columns in span(W)); matmul rounding injects out-of-span noise only
  at the elementwise output-rounding level, and the final cubic tail
  run at precision=highest contracts the orthogonality defect
  quadratically (1e-3 -> 1e-6 -> f32 floor in 2 iterations).  So the
  quintic stage can run at precision=default (1 bf16 pass) or 'high'
  (3 passes) while the tail stays 'highest', cutting the polar matmul
  cost up to ~2.5x IF accuracy holds.

Accuracy gates (same bar as polar_core_experiment.py): S err class
<= ~4e-5 (the shipped jacobi_core class), kept-weight misplacement
~1e-6 class, V orth at the f32 floor -- on CAPTURED settled thetas.

Run on the TPU host:  python baselines/core_anatomy_experiment.py
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

from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.pallas.jacobi_svd import (_QUINTIC_A, _QUINTIC_B,
                                                   _QUINTIC_C, _cols_to_sv,
                                                   _fixed_projection_basis,
                                                   _ns_polish,
                                                   _orthogonalize_columns,
                                                   jacobi_core)

# ---------------------------------------------------------------- helpers

def _ces(spec, a, b, precision):
    """Complex einsum at an explicit matmul precision (cpx.einsum is
    pinned to the module-global 'highest')."""
    es = partial(jnp.einsum, precision=precision)
    re = es(spec, a.re, b.re) - es(spec, a.im, b.im)
    im = es(spec, a.re, b.im) + es(spec, a.im, b.re)
    return C(re, im)


def poly_polar_mixed(X: C, q_iters: int, c_iters: int,
                     q_precision: str, c_tail_highest: int = 2) -> C:
    """_poly_polar with the quintic stage at ``q_precision`` and the last
    ``c_tail_highest`` cubic iterations (plus the rest of the cubic
    stage) at 'highest'."""
    nrm = jnp.sqrt(jnp.sum(cpx.abs2(X), axis=(-2, -1), keepdims=True))
    inv = jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
    W = C(X.re * inv, X.im * inv)
    k = X.re.shape[-1]
    eye = jnp.eye(k, dtype=X.dtype)
    for _ in range(q_iters):
        G = _ces("...ji,...jk->...ik", W.conj(), W, q_precision)
        G2 = _ces("...ij,...jk->...ik", G, G, q_precision)
        coef = C(_QUINTIC_A * eye + _QUINTIC_B * G.re + _QUINTIC_C * G2.re,
                 _QUINTIC_B * G.im + _QUINTIC_C * G2.im)
        W = _ces("...ij,...jk->...ik", W, coef, q_precision)
    for i in range(c_iters):
        p = "highest"
        G = _ces("...ji,...jk->...ik", W.conj(), W, p)
        coef = C(1.5 * eye - 0.5 * G.re, -0.5 * G.im)
        W = _ces("...ij,...jk->...ik", W, coef, p)
    return W


@partial(jax.jit, static_argnames=("k", "q_iters", "c_iters", "q_precision",
                                   "max_sweeps", "tol", "polish_iters",
                                   "stop_at"))
def core_mixed(theta: C, k: int, q_iters: int = 10, c_iters: int = 4,
               q_precision: str = "highest", max_sweeps: int = 12,
               tol: float = 1e-6, polish_iters: int = 4,
               stop_at: str = "full"):
    """jacobi_core with precision knobs + early exits for anatomy timing.

    stop_at: 'polars' (through step 6, returns K as 'S'), 'nokernel'
    (everything except the rotation kernel: K passed straight to
    _cols_to_sv), 'full'.
    """
    squeeze = theta.ndim == 2
    if squeeze:
        theta = C(theta.re[None], theta.im[None])
    Bn, m, n = theta.re.shape
    Q0 = _fixed_projection_basis(n, k, theta.dtype)
    T = cpx.einsum("bmn,nk->bmk", theta, Q0)
    W = poly_polar_mixed(T, q_iters, c_iters, q_precision)
    Y = cpx.einsum("bmn,bmk->bnk", theta.conj(), W)
    Z = poly_polar_mixed(Y, q_iters, c_iters, q_precision)
    P = cpx.einsum("bmn,bnk->bmk", theta, Z)
    K = cpx.einsum("bmk,bml->bkl", W.conj(), P)
    if stop_at == "polars":
        return jnp.sum(cpx.abs2(K), axis=(-2, -1)), K, K
    Kh = C(jnp.swapaxes(K.re, -1, -2), -jnp.swapaxes(K.im, -1, -2))
    if stop_at == "nokernel":
        Km = Kh
    else:
        Km = _orthogonalize_columns(Kh, max_sweeps, tol, False)
    S, Vk = _cols_to_sv(Km, polish=0)
    V = cpx.einsum("bnk,bkl->bnl", Z, Vk)
    if polish_iters:
        V = _ns_polish(V, k, iters=polish_iters)
    disc = jnp.sum(cpx.abs2(theta), axis=(-2, -1)) - jnp.sum(S * S, axis=-1)
    disc = jnp.maximum(disc, 0.0)
    if squeeze:
        S, V, disc = S[0], V[0], disc[0]
    return S, V, disc


def _check(tag, S, V, Mc, k):
    S = np.asarray(S, np.float64)
    Vc = np.asarray(V.re, np.float64) + 1j * np.asarray(V.im, np.float64)
    S_true = np.linalg.svd(Mc, compute_uv=False)
    s_err = np.max(np.abs(S[:, :k] - S_true[:, :k]) / S_true[:, :1])
    w_opt = np.sum(S_true[:, :k] ** 2, axis=1)
    w_got = np.array([np.linalg.norm(Mc[b] @ Vc[b], "fro") ** 2
                      for b in range(Mc.shape[0])])
    w_mis = np.max((w_opt - w_got) / np.sum(S_true ** 2, axis=1))
    orth = max(np.abs(Vc[b].conj().T @ Vc[b]
                      - np.eye(k)).max() for b in range(Mc.shape[0]))
    print(f"  {tag:52s} S err={s_err:.2e}  kept-w mis={w_mis:+.2e}  "
          f"V orth={orth:.2e}", flush=True)


def capture_thetas(L=40, chi=256):
    from timecrystal_tpu.core.mps import (apply_one_site_gates,
                                          create_initial_state)
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
    from timecrystal_tpu.models.kicked_ising import (
        FloquetGates, _square_diagonal_gates, draw_disorder_reference,
        make_floquet_gates)

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
    return M, Mc


def bench(tag, f, *args, reps=5, check=None, k=None, Mc=None):
    out = f(*args)
    np.asarray(out[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(out[0])
    dt = (time.time() - t0) / reps
    print(f"{tag:54s} {dt * 1e3:7.1f} ms", flush=True)
    if check:
        _check(tag, out[0], out[1], Mc, k)
    return dt


def main():
    chi = 256
    M, Mc = capture_thetas(chi=chi)

    print("\n== anatomy (shipped defaults q=10 c=4, tol=1e-6) ==", flush=True)
    shipped = jax.jit(lambda th: jacobi_core(th, chi))
    bench("jacobi_core (shipped)", shipped, M, check=True, k=chi, Mc=Mc)
    polars = jax.jit(lambda th: core_mixed(th, chi, stop_at="polars"))
    t_pol = bench("  polars only (steps 1-6)", polars, M)
    nok = jax.jit(lambda th: core_mixed(th, chi, stop_at="nokernel"))
    t_nok = bench("  all but rotation kernel", nok, M)
    full = jax.jit(lambda th: core_mixed(th, chi))
    t_full = bench("  full (mixed-impl, highest)", full, M)
    print(f"  => rotation kernel ~{(t_full - t_nok) * 1e3:.1f} ms, "
          f"polish+V ~{(t_nok - t_pol) * 1e3:.1f} ms, "
          f"polars+matmuls ~{t_pol * 1e3:.1f} ms", flush=True)

    print("\n== mixed-precision quintic stage ==", flush=True)
    for prec in ("high", "default"):
        for q, c in ((10, 4), (12, 4)):
            f = jax.jit(lambda th, p=prec, q=q, c=c: core_mixed(
                th, chi, q_iters=q, c_iters=c, q_precision=p))
            bench(f"core_mixed q={q}@{prec} c={c}@highest", f, M,
                  check=True, k=chi, Mc=Mc)

    print("\n== core-kernel tolerance ==", flush=True)
    for tol, ms in ((1e-5, 12), (3e-6, 12), (1e-6, 12)):
        f = jax.jit(lambda th, t=tol, m=ms: core_mixed(
            th, chi, tol=t, max_sweeps=m))
        bench(f"core_mixed tol={tol:g}", f, M, check=True, k=chi, Mc=Mc)


if __name__ == "__main__":
    main()
