"""Complex SVD for TPU backends without native SVD or complex dtypes.

The axon TPU backend (the deployment target) implements neither complex
dtypes nor ``lax.linalg.svd`` (UNIMPLEMENTED for float32 and complex64 --
verified empirically; only real eigh/qr/cholesky/matmul exist).  This module
provides the truncated-SVD primitive the TEBD two-site update needs
(SURVEY.md section 2.2 "implicit native kernels": LAPACK gesdd inside
TeNPy), with interchangeable backends ('native', 'gram_eigh',
'gram_eigh_gs', 'jacobi' -- see ``csvd``/``csvd_topk``); the two
eigh-based ones:

  * ``method='native'`` -- pack (re, im) pairs into a complex dtype and call
    ``jnp.linalg.svd`` (LAPACK).  Used on CPU, including the float64
    1e-8 parity gates.
  * ``method='gram_eigh'`` -- TPU path, built ONLY from ops the TPU
    supports:
      1. Gram matrix G = theta^H theta (complex Hermitian, via real matmuls),
      2. real symmetric embedding R(G) = [[Gr, -Gi], [Gi, Gr]] -> ``eigh``
         (eigenvalues of G doubled; real eigenvector [x; y] maps to complex
         eigenvector x + i y, and its J-partner [-y; x] maps to i(x + i y),
         i.e. the SAME complex line),
      3. selection of n right-singular vectors from the 2n candidates:
         fast path = even indices (J-partners are adjacent and complex-
         parallel) + Newton-Schulz polish + a 64*eps diagonal split of
         exact ties; robust path ('gram_eigh_gs') = masked Gram-Schmidt
         scan over all candidates,
      4. singular values as column norms of theta V (computed unsquared,
         so large sigma keep full f32 accuracy; sigma below
         ~sqrt(eps_f32)*sigma_max are resolution-limited -- they sit below
         any physical truncation cutoff used here).

The Pallas one-sided Jacobi kernel (ops/pallas/jacobi_svd.py) is the
default on TPU for n >= 256: true-SVD accuracy (no Gram squaring, no
pairing step) and the fastest measured path on the TEBD workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cpx
from .cpx import C


def _interpret_mode() -> bool:
    """Pallas kernels compile only on TPU; on the CPU backend an EXPLICIT
    jacobi-family svd_method runs the same kernel in interpret mode
    (bit-equivalent semantics, orders of magnitude slower -- fine for
    tests/debugging; the auto-routing never picks these paths on CPU)."""
    return jax.default_backend() == "cpu"


def _pack_complex(a: C):
    cdtype = jnp.complex128 if a.dtype == jnp.float64 else jnp.complex64
    return a.re.astype(cdtype) + 1j * a.im.astype(cdtype)


def _unpack_complex(x, dtype) -> C:
    return C(jnp.real(x).astype(dtype), jnp.imag(x).astype(dtype))


def _svd_native(theta: C):
    """LAPACK-backed complex SVD (CPU backend)."""
    U, S, Vh = jnp.linalg.svd(_pack_complex(theta), full_matrices=False)
    return (_unpack_complex(U, theta.dtype), S.astype(theta.dtype),
            _unpack_complex(Vh, theta.dtype))


def _orthonormal_select(cands: C, n: int):
    """Select n orthonormal columns from 2n candidates (desc importance).

    Masked Gram-Schmidt as a lax.scan: project each candidate on the
    accepted basis, accept if the residual keeps > 1/4 of its norm.
    Exact J-duplicates have residual ~0; genuine new directions ~1.
    """
    dtype = cands.dtype
    n2 = cands.shape[-1]

    def step(carry, k):
        Q_re, Q_im, count = carry  # Q: [n, n] accepted columns
        v = C(cands.re[:, k], cands.im[:, k])  # [n]
        Q = C(Q_re, Q_im)
        # coeffs = Q^H v ; v -= Q coeffs   (projection against accepted)
        coeffs = cpx.einsum("ij,i->j", Q.conj(), v)
        v = v - cpx.einsum("ij,j->i", Q, coeffs)
        # second orthogonalization pass for f32 robustness (CGS2)
        coeffs2 = cpx.einsum("ij,i->j", Q.conj(), v)
        v = v - cpx.einsum("ij,j->i", Q, coeffs2)
        nrm2 = jnp.sum(cpx.abs2(v))
        accept = (nrm2 > 0.25) & (count < n)
        inv = jnp.where(accept, 1.0 / jnp.sqrt(jnp.maximum(nrm2, 1e-30)), 0.0)
        onehot = (jnp.arange(n) == count).astype(dtype) * inv.astype(dtype)
        Q_re = Q_re + v.re[:, None] * onehot[None, :]
        Q_im = Q_im + v.im[:, None] * onehot[None, :]
        count = count + accept.astype(count.dtype)
        return (Q_re, Q_im, count), None

    init = (jnp.zeros((n, n), dtype), jnp.zeros((n, n), dtype),
            jnp.zeros((), jnp.int32))
    (Q_re, Q_im, count), _ = jax.lax.scan(step, init, jnp.arange(n2))
    return C(Q_re, Q_im)


def _fixed_perturbation(n: int, dtype) -> jax.Array:
    """Deterministic 'generic' diagonal in (0.5, 1.5): golden-ratio sequence
    (no Mersenne structure, no runtime RNG state)."""
    k = np.arange(1, n + 1, dtype=np.float64)
    vals = np.mod(k * 0.6180339887498949, 1.0) + 0.5
    return jnp.diag(jnp.asarray(vals, dtype=dtype))


def _select_fast(cands: C, n: int) -> C:
    """Fast candidate selection: even indices + Newton-Schulz polish.

    Within one exactly-doubled eigenvalue of R(G), the two real eigenvectors
    w and (necessarily) +-Jw map to the SAME complex line (v and +-iv), and
    eigh returns them adjacent in the sorted order -- so taking every second
    candidate picks exactly one representative per complex eigenvector in
    the generic case.  Two Newton-Schulz polar iterations then repair the
    mild non-orthonormality f32 eigh leaves between near-degenerate
    clusters.  Pathological mis-pairing (exactly degenerate NONZERO Schmidt
    clusters where the eigensolver happens to mix J-planes) is handled by
    the scan-based Gram-Schmidt path (method='gram_eigh_gs'), which
    cross-validation tests exercise; zero-sigma slots never matter because
    truncation masks their Vh rows to zero.
    """
    V = C(cands.re[:, 0::2], cands.im[:, 0::2])      # [n, n] even images
    W = C(cands.re[:, 1::2], cands.im[:, 1::2])      # [n, n] odd images

    # --- local dedup for degenerate clusters -------------------------------
    # A 2-fold sigma degeneracy is a 4-fold real cluster whose four
    # candidates span only 2 complex dims; even-index selection can then
    # pick two complex-parallel vectors.  Detect adjacent parallel picks
    # and rebuild column k+1 from whichever cluster candidate (even k+1,
    # its odd partner, or odd k) keeps the largest residual orthogonal to
    # column k.  Fully vectorized -- no scan; chains longer than one
    # correction (>=3-fold sigma ties) fall to 'gram_eigh_gs'.
    u_prev = C(V.re[:, :-1], V.im[:, :-1])           # columns 0..n-2
    candidates = (C(V.re[:, 1:], V.im[:, 1:]),        # even k+1 (current)
                  C(W.re[:, 1:], W.im[:, 1:]),        # odd  k+1
                  C(W.re[:, :-1], W.im[:, :-1]))      # odd  k
    best = None
    best_n2 = None
    for cand in candidates:
        ov = cpx.einsum("ik,ik->k", u_prev.conj(), cand)   # u_k^H c_k
        resid = cand - u_prev * ov[None, :]
        n2 = jnp.sum(cpx.abs2(resid), axis=0)
        if best is None:
            best, best_n2 = resid, n2
        else:
            take = n2 > best_n2
            best = cpx.where(take[None, :], resid, best)
            best_n2 = jnp.where(take, n2, best_n2)
    overlap0 = cpx.cabs(cpx.einsum("ik,ik->k", u_prev.conj(),
                                   candidates[0]))  # |<u_k, v_{k+1}>|
    dup = overlap0 > 0.70
    inv = 1.0 / jnp.sqrt(jnp.maximum(best_n2, 1e-30))
    fixed = best * inv[None, :]
    keep_mask = dup[None, :]
    V = C(V.re.at[:, 1:].set(jnp.where(keep_mask, fixed.re, V.re[:, 1:])),
          V.im.at[:, 1:].set(jnp.where(keep_mask, fixed.im, V.im[:, 1:])))

    # --- Newton-Schulz orthonormalization polish ---------------------------
    # Quadratic convergence: defect e -> ~(3/4)e^2 per step.  Degenerate
    # clusters can start with defects up to ~0.85 after dedup (measured
    # 0.92 pre-dedup), so 6 iterations take worst cases below 1e-9; the
    # generic case (defect ~eps) is unaffected.  Mixing stays within
    # clusters (cross-cluster overlaps are ~0), which is gauge freedom.
    eye = jnp.eye(n, dtype=cands.dtype)
    for _ in range(6):
        P = cpx.einsum("ji,jk->ik", V.conj(), V)     # V^H V
        corr = C(1.5 * eye - 0.5 * P.re, -0.5 * P.im)
        V = cpx.einsum("ij,jk->ik", V, corr)
    return V


def _svd_gram_eigh(theta: C, select: str = "fast", return_defect: bool = False):
    """TPU-native complex SVD via Gram matrix + real-embedded eigh.

    ``return_defect=True`` skips the in-function degeneracy fallback and
    returns (U, S, Vh, defect) instead, so BATCHED callers can hoist the
    fallback decision to one batch-level cond (_svd_gram_eigh_batch): a
    per-matrix lax.cond under vmap lowers to select, which executes both
    branches -- the O(2n)-step Gram-Schmidt scan would then run for every
    matrix in every call."""
    m, n = theta.shape[-2:]
    if m != n:
        raise NotImplementedError("gram_eigh SVD implemented for square theta")
    # G = theta^H theta  (Hermitian)
    G = cpx.einsum("ji,jk->ik", theta.conj(), theta)
    if select == "fast":
        # Split exactly-degenerate eigenvalue clusters with a tiny FIXED
        # diagonal perturbation: the structural J-doubling of the real
        # embedding is untouched (partners stay exact and adjacent), but
        # distinct complex eigenvectors no longer share an eigenvalue, so
        # even-index selection picks one representative per complex line
        # even for symmetric/degenerate Schmidt spectra.  Singular values
        # are unaffected: S is recomputed exactly from ||theta V|| below,
        # and intra-cluster rotation of V is gauge freedom.
        # Splitting scale: a trade-off measured empirically.  Large splits
        # (sqrt(eps)) guarantee clean pairing but gauge-mix sigma clusters
        # up to sqrt(eps)*sigma_max, corrupting small Schmidt values (1e-5
        # relative errors observed in f64).  64*eps keeps sigma errors at
        # ambient-noise level and handles generic exact ties; HIGH-fold
        # exactly-degenerate nonzero clusters (measure-zero in disordered
        # physics -- disorder breaks the symmetries that create them) can
        # still mis-pair, for which the scan-based 'gram_eigh_gs' method is
        # the robust fallback (regression-tested).  The planned Pallas
        # one-sided Jacobi kernel has no pairing step at all.
        eps = 64.0 * jnp.finfo(theta.dtype).eps
        scale = jnp.max(jnp.abs(jnp.diagonal(G.re))) + 1e-30
        r = _fixed_perturbation(n, theta.dtype)
        G = C(G.re + (eps * scale) * r, G.im)
    Rg = cpx.real_embedding(G)                       # [2n, 2n] real symmetric
    w, W = jnp.linalg.eigh(Rg)                       # ascending
    W = W[:, ::-1]                                   # descending importance
    cands = C(W[:n, :], W[n:, :])                    # [n, 2n] complex columns
    defect = None
    if select == "fast":
        V = _select_fast(cands, n)                   # [n, n]
        # runtime guard for >=3-fold exactly-degenerate NONZERO sigma
        # clusters: the one-step dedup cannot fix chains and used to
        # return a silently non-orthonormal V.  Detect the residual
        # defect and fall back to the scan-based Gram-Schmidt selection;
        # unbatched, lax.cond executes only the taken branch, so the
        # generic case (defect ~eps) never pays for the scan (batched
        # callers hoist this -- see return_defect above).
        gram = cpx.einsum("ji,jk->ik", V.conj(), V)
        eye_n = jnp.eye(n, dtype=V.dtype)
        defect = jnp.max(jnp.abs(gram.re - eye_n)) + jnp.max(jnp.abs(gram.im))
        if not return_defect:
            V_fast = V
            V = jax.lax.cond(
                defect > 1e-3,
                lambda c: _orthonormal_select(c, n),
                lambda _c: V_fast,
                cands)
    else:
        V = _orthonormal_select(cands, n)            # [n, n]
    P = cpx.einsum("ij,jk->ik", theta, V)            # theta V = U S
    S = jnp.sqrt(jnp.sum(cpx.abs2(P), axis=-2))      # column norms
    # enforce descending order (GS may disorder inside degenerate clusters)
    order = jnp.argsort(-S)
    S = S[order]
    V = C(V.re[:, order], V.im[:, order])
    P = C(P.re[:, order], P.im[:, order])
    inv = jnp.where(S > 1e-30, 1.0 / jnp.maximum(S, 1e-30), 0.0)
    U = C(P.re * inv[None, :], P.im * inv[None, :])
    Vh = V.conj().transpose()
    if return_defect:
        return U, S, Vh, defect
    return U, S, Vh


def _svd_gram_eigh_batch(theta: C):
    """Batched fast-selection gram_eigh with the degeneracy fallback
    hoisted to ONE batch-level cond: the generic case (no >=3-fold
    exactly-degenerate nonzero cluster anywhere in the batch) runs the
    fast path only; a detected defect re-runs the WHOLE batch through the
    scan-based Gram-Schmidt selection (rare: disorder breaks the
    symmetries that create such clusters).  Under an additional OUTER
    vmap (ensemble sweeps vmapping whole evolutions) the cond still
    lowers to select -- unavoidable -- but direct batched calls never pay
    for the scan in the generic case."""
    nb = theta.ndim - 2
    if nb == 0:
        return _svd_gram_eigh(theta)

    fast = partial(_svd_gram_eigh, return_defect=True)
    gs = partial(_svd_gram_eigh, select="gs")
    for _ in range(nb):
        fast = jax.vmap(fast)
        gs = jax.vmap(gs)
    U, S, Vh, defect = fast(theta)
    return jax.lax.cond(
        jnp.any(defect > 1e-3),
        gs,
        lambda _th: (U, S, Vh),
        theta)


def heigh(G: C, method: str = "auto"):
    """Complex Hermitian eigendecomposition: G = V diag(w) V^H, w ascending.

    Same backend split as ``csvd``: packed LAPACK eigh on CPU; real-embedded
    eigh + J-pair selection on TPU (no complex dtypes there).
    """
    if method == "auto":
        method = "native" if jax.default_backend() == "cpu" else "gram_eigh"
    if G.ndim > 2:
        f = partial(heigh, method=method)
        for _ in range(G.ndim - 2):
            f = jax.vmap(f)
        return f(G)
    if method == "native":
        w, V = jnp.linalg.eigh(_pack_complex(G))
        return w.astype(G.dtype), _unpack_complex(V, G.dtype)
    n = G.shape[-1]
    eps = 64.0 * jnp.finfo(G.dtype).eps
    scale = jnp.max(jnp.abs(jnp.diagonal(G.re))) + 1e-30
    Gp = C(G.re + (eps * scale) * _fixed_perturbation(n, G.dtype), G.im)
    w2, W = jnp.linalg.eigh(cpx.real_embedding(Gp))          # ascending, 2n
    W = W[:, ::-1]
    cands = C(W[:n, :], W[n:, :])
    V = _select_fast(cands, n)                               # desc eigenvalue
    # same >=3-fold-degeneracy runtime guard as _svd_gram_eigh: without
    # it a pathological cluster returns a silently non-orthonormal V,
    # which propagates into hermitian_invsqrt/cqr_tall (TDVP canonical
    # form) with no error raised
    gram = cpx.einsum("ji,jk->ik", V.conj(), V)
    eye_n = jnp.eye(n, dtype=V.dtype)
    defect = jnp.max(jnp.abs(gram.re - eye_n)) + jnp.max(jnp.abs(gram.im))
    V_fast = V
    V = jax.lax.cond(
        defect > 1e-3,
        lambda c: _orthonormal_select(c, n),
        lambda _c: V_fast,
        cands)
    V = C(V.re[:, ::-1], V.im[:, ::-1])                      # ascending
    # Rayleigh quotients on the UNperturbed G (exact eigenvalues for exact
    # eigenvectors; removes the perturbation bias)
    GV = cpx.einsum("ij,jk->ik", G, V)
    w = cpx.einsum("ik,ik->k", V.conj(), GV).re
    return w, V


def hermitian_invsqrt(G: C, rel_eps: float | None = None, method: str = "auto"):
    """(G^{-1/2}, G^{1/2}) for Hermitian PSD G with padded-rank masking:
    eigenvalues below rel_eps * w_max are treated as exact zeros (their
    directions stay zero, matching the padded-MPS convention).  Default
    rel_eps = 16 * machine eps -- as tight as the Gram construction can
    resolve (G already squares the condition number)."""
    w, V = heigh(G, method=method)
    if rel_eps is None:
        rel_eps = 16.0 * float(jnp.finfo(G.dtype).eps)
    wmax = jnp.max(w) + 1e-300
    ok = w > rel_eps * wmax
    inv = jnp.where(ok, 1.0 / jnp.sqrt(jnp.maximum(w, 1e-300)), 0.0)
    sq = jnp.where(ok, jnp.sqrt(jnp.maximum(w, 0.0)), 0.0)
    Vh = V.conj().transpose()
    inv_sqrt = cpx.einsum("ij,jk->ik", V * inv[None, :], Vh)
    sqrt = cpx.einsum("ij,jk->ik", V * sq[None, :], Vh)
    return inv_sqrt, sqrt


def cqr_tall(M: C, method: str = "auto"):
    """Isometric factorization M = Q R for tall complex M [m, n] (m >= n):
    Q [m, n] with Q^H Q = I on the numerical range, R [n, n] Hermitian PSD.

    Cholesky-QR-via-eigh: G = M^H M, Q = M G^{-1/2}, R = G^{1/2}.  R is not
    triangular -- TDVP only needs SOME isometric split, and the Hermitian
    square root is gauge-equivalent.  Rank-deficient (padded) directions
    yield zero columns in Q and zero rows/cols in R, preserving the padded
    convention.  One refinement pass keeps f32 orthogonality tight.

    (A Pallas-Jacobi variant was measured and REJECTED: standalone it is
    1.35x faster per call, but inside TDVP's per-site scans the kernel
    launches made the whole period 4x slower -- the in-program small-n
    eigh is cheap; see baselines/tdvp_tpu_probe.py and PERFORMANCE.md.)
    """
    G = cpx.einsum("ji,jk->ik", M.conj(), M)
    inv_sqrt, sqrt = hermitian_invsqrt(G, method=method)
    Q = cpx.einsum("ij,jk->ik", M, inv_sqrt)
    # refinement: Q <- Q (Q^H Q)^{-1/2}, fold correction into R
    G2 = cpx.einsum("ji,jk->ik", Q.conj(), Q)
    inv2, sq2 = hermitian_invsqrt(G2, method=method)
    Q = cpx.einsum("ij,jk->ik", Q, inv2)
    R = cpx.einsum("ij,jk->ik", sq2, sqrt)
    return Q, R


def csvd_topk(theta: C, k: int, method: str = "auto",
              jacobi_sweeps: int = 0):
    """Top-k truncated SVD: (S [.., k], Vh C[.., k, n], disc [..]).

    method 'auto': full native SVD + slice on CPU; on TPU the Pallas Jacobi
    kernel for small batches / the batched gram_eigh otherwise.
    jacobi_sweeps: 0 = dtype default.

    CAVEAT (auto under vmap): the batch-size heuristic reads theta.shape,
    which omits vmapped axes, so a large vmapped ensemble looks like a
    small batch here and routes to the Jacobi kernel (VPU time linear in
    the true batch).  Resolve the method OUTSIDE the vmap for ensemble
    sweeps -- parallel/sweep._resolve_svd_method does exactly that for
    the shipped drivers.
    """
    m, n = theta.shape[-2:]
    if method == "auto":
        if jax.default_backend() == "cpu":
            method = "native"
        else:
            # Measured on the axon TPU: the Pallas Jacobi kernel beats the
            # batched gram_eigh at n=512 always (~6x single-chain), and at
            # SMALL batch sizes at every n (batch 20: 9.2 vs 17.8 ms at
            # n=64, 16.6 vs 46.5 at n=128, 34 vs 222 at n=256 -- the
            # backend's eigh has a large flat cost).  gram_eigh stays the
            # pick only for LARGE batches of small matrices (the vmapped
            # phase-grid sweeps: one big eigh amortizes over ~1000
            # matrices, while the Jacobi kernel's VPU time grows linearly
            # with batch).
            bsz = 1
            for s in theta.shape[:-2]:
                bsz *= int(s)
            small_batch = bsz <= 64
            if m != n:
                # gram_eigh is square-only; the full Jacobi kernel is the
                # one TPU path that handles rectangular (and odd-column)
                # panels
                method = "jacobi"
            else:
                method = ("jacobi" if n % 2 == 0 and
                          (n >= 256 or (small_batch and n >= 32))
                          else "gram_eigh")

    if method == "jacobi_proj":
        # Chained half-power projected SVD (ops/pallas/jacobi_svd.
        # jacobi_proj): only k singular triplets are ever computed, on
        # [m, k]-column panels (~4x less rotation traffic at k = n/2).
        # Steady-state saturated-chi fast path; falls back to the full
        # kernel when the panel shape is unsupported.
        from .pallas.jacobi_svd import jacobi_proj

        if k % 2 == 0 and k <= min(m, n):
            if theta.dtype == jnp.float64:
                # f64: dtype-default tols; polish 6 measured equal-accuracy
                # to 12 on steady-state thetas (chained_proj_timing.py).
                tuned = dict(polish_b_iters=6, polish_iters=6)
            else:
                # f32 tuned config (closed-loop A/B, baselines/
                # chained_proj_tol_tuning.py): tol 1e-6 + polish 4+4 is 17%
                # faster (5.43 vs 4.64 p/s steady at L=40 chi=256) with
                # 50-period trace deltas in the default's class
                # (|d stag| 1.1e-3 vs 8.4e-4, |d LE| 7.5e-4 vs 3.0e-4,
                # |d sz| equal).  NS polish is quadratic: 4 iters resolve
                # the looser-tol defects (~1e-3) to the f32 floor.
                tuned = dict(tol=1e-6, tol_b=1e-6,
                             polish_b_iters=4, polish_iters=4)
            S, V, disc = jacobi_proj(theta, k,
                                     max_sweeps=jacobi_sweeps or None,
                                     polish=k,
                                     interpret=_interpret_mode(),
                                     **tuned)
            Vh = C(jnp.swapaxes(V.re, -1, -2), -jnp.swapaxes(V.im, -1, -2))
            return S, Vh, disc
        method = "jacobi"

    if method in ("jacobi_core", "jacobi_core_fast"):
        # Core-matrix projected SVD (ops/pallas/jacobi_svd.jacobi_core):
        # both subspace bases by polynomial polar (all MXU matmuls), ONE
        # rotation kernel on the k x k core -- measured 2x jacobi_proj /
        # 5x jacobi_sv per call at L=40 chi=256 (41 vs 84 vs 205 ms,
        # baselines/polar_core_experiment.py) with kept-weight
        # misplacement 1.2e-6.  Same caveat as jacobi_proj: the reported
        # trunc_err carries the f32 Frobenius noise floor + projection
        # leak, so it must not drive chi-escalation decisions (the staged
        # drivers pin 'jacobi' -- sweep._stage_tp).
        #
        # 'jacobi_core_fast' additionally runs the f32 quintic polar stage
        # at single-pass-bf16 matmul precision (~1.2x per call) -- SAFE
        # ONLY on steep saturated spectra (TEBD steady state, where it is
        # closed-loop trace-gated: baselines/jacobi_core_closedloop.py);
        # on dense near-boundary spectra bf16 collapses boundary
        # directions into an unrepairable orthonormality defect (see
        # jacobi_core's quintic_precision note).  The plain method keeps
        # full precision for every input class.
        from .pallas.jacobi_svd import jacobi_core

        if k % 2 == 0 and k <= min(m, n):
            fast = (method == "jacobi_core_fast"
                    and theta.dtype != jnp.float64)   # f64 keeps 'highest'
            # fast = the closed-loop-gated saturated-TEBD config: bf16
            # quintic polar + fixed 4-iteration polish (its junk-column
            # defect class is part of what the gate measured)
            tuned = (dict(quintic_precision="default", polish_iters=4,
                          polish_adaptive=False) if fast else {})
            S, V, disc = jacobi_core(theta, k,
                                     max_sweeps=jacobi_sweeps or None,
                                     interpret=_interpret_mode(), **tuned)
            Vh = C(jnp.swapaxes(V.re, -1, -2), -jnp.swapaxes(V.im, -1, -2))
            return S, Vh, disc
        method = "jacobi"

    if method in ("jacobi", "jacobi_full"):
        # Pallas one-sided Jacobi kernel (whole batch in one call).  The
        # top-k path needs only (S, Vh): the V-free transpose-trick kernel
        # (jacobi_sv, rotations on theta^H with no V accumulator) is ~1.5x
        # the full kernel's speed and exits early once converged.
        # 'jacobi_full' forces the V-accumulating U,S,Vh kernel (also
        # adaptive-exit; handles rectangular / odd-column inputs).
        from .pallas.jacobi_svd import jacobi_sv, jacobi_svd

        if method == "jacobi" and m == n and n % 2 == 0:
            S, V = jacobi_sv(theta, max_sweeps=jacobi_sweeps or None,
                             polish=k, interpret=_interpret_mode())
            Vh = C(jnp.swapaxes(V.re, -1, -2), -jnp.swapaxes(V.im, -1, -2))
        else:
            U, S, Vh = jacobi_svd(theta, n_sweeps=jacobi_sweeps or None,
                                  interpret=_interpret_mode())
        disc = jnp.sum(S[..., k:] ** 2, axis=-1)
        return (S[..., :k], C(Vh.re[..., :k, :], Vh.im[..., :k, :]), disc)

    if method == "gram_eigh":
        # batch form: degeneracy fallback hoisted to one batch-level cond
        # (a per-matrix cond under vmap would run the GS scan always)
        U, S, Vh = _svd_gram_eigh_batch(theta)
        disc = jnp.sum(S[..., k:] ** 2, axis=-1)
        return (S[..., :k], C(Vh.re[..., :k, :], Vh.im[..., :k, :]), disc)
    if method not in ("native", "gram_eigh_gs"):
        # an unrecognized name must not silently fall through to the
        # sqrt(eps)-limited Gram path (a typo'd 'native' would corrupt
        # the 1e-8 parity gates with no error)
        raise ValueError(f"unknown csvd_topk method: {method}")

    def one(th):
        if method == "native":
            U, S, Vh = _svd_native(th)
        else:
            U, S, Vh = _svd_gram_eigh(th, select="gs")
        disc = jnp.sum(S[k:] ** 2)
        return S[:k], C(Vh.re[:k, :], Vh.im[:k, :]), disc

    ndim = theta.ndim
    f = one
    for _ in range(ndim - 2):
        f = jax.vmap(f)
    return f(theta)


def csvd(theta: C, method: str = "auto"):
    """Batched complex SVD: theta [..., m, n] -> (U, S, Vh), S descending.

    method: 'native' (complex LAPACK; CPU), 'gram_eigh' (TPU, fast
    selection), 'gram_eigh_gs' (TPU, scan-based Gram-Schmidt selection --
    robust to pathological degeneracies, much slower), 'jacobi' (TPU
    Pallas kernel, adaptive sweeps), or 'auto' (native on CPU backend,
    gram_eigh otherwise -- in-program eigh is the measured winner for
    the per-site scan call sites that use csvd; the kernel pays off only
    on large batched calls, which route through csvd_topk).
    """
    if method == "auto":
        method = "native" if jax.default_backend() == "cpu" else "gram_eigh"
    if method == "jacobi":
        from .pallas.jacobi_svd import jacobi_svd

        return jacobi_svd(theta, interpret=_interpret_mode())
    if method == "native":
        fn = _svd_native
    elif method == "gram_eigh":
        # batch-hoisted degeneracy fallback (see _svd_gram_eigh_batch)
        return _svd_gram_eigh_batch(theta)
    elif method == "gram_eigh_gs":
        fn = partial(_svd_gram_eigh, select="gs")
    else:
        raise ValueError(f"unknown csvd method: {method}")
    ndim = theta.ndim
    if ndim == 2:
        return fn(theta)
    # vmap over leading batch dims
    f = fn
    for _ in range(ndim - 2):
        f = jax.vmap(f)
    return f(theta)
