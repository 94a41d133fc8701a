"""One-sided complex Jacobi SVD as Pallas TPU kernels.

The blocked/parallel one-sided Jacobi from the BASELINE north star: sweeps
run INSIDE kernels with the matrices resident in VMEM, eliminating the
per-iteration dispatch overhead that dominates XLA's eigh on this backend
(~150 ms per call regardless of size -- measured).  Unlike the Gram+eigh
path it never squares the condition number (small sigma accurate to eps,
not sqrt(eps)) and has no J-pairing step at all.

Algorithm (validated against LAPACK in baselines/jacobi_prototype.py):
columns in two halves L | R paired elementwise; each parallel step
orthogonalizes all n/2 pairs with complex Givens rotations, then the
pairing rotates by the classic tournament (circle) scheme, realized as
static slices + concats on values (the arrangement returns to the original
order after each full sweep of n-1 steps).

Two kernels:
  * ``jacobi_svd`` -- full (U, S, Vh), V accumulated in-kernel, adaptive
    sweep exit (while_loop over one-sweep kernels, same convergence
    measure as the hot path); the general csvd API incl. rectangular and
    odd-column inputs.
  * ``jacobi_sv`` -- the TEBD hot path: (S, V) only via rotations on
    theta^H (no V accumulator), incremental column norms, and an
    XLA-level while_loop over one-sweep kernels that stops when the
    sweep's convergence measure drops below tol.  ~1.35x the full kernel
    at matched accuracy; see PERFORMANCE.md for the cost anatomy (the
    sweep kernel is VMEM-bandwidth-bound).

Complex arithmetic is explicit (re, im) pairs (no complex dtypes on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cpx
from ..cpx import C


def _pair_rotation(a, b, c_re, c_im):
    """Complex Jacobi rotation parameters for column pairs: given column
    norms a, b and complex overlap c = <L, R>, returns
    (cs, w1_re, w1_im, w2_re, w2_im, t_, absc) for
    u' = cs u - w1 v ; v' = w2 u + cs v with w1 = sn conj(ph), w2 = sn ph.

    Shared by both Pallas sweep kernels (plain jnp traces fine under
    Mosaic) and the n=2 analytic path, so the numerics exist exactly once.
    The sign at tau = 0 is taken POSITIVE: equal-norm correlated pairs
    need the full 45-degree rotation; ``jnp.sign`` returns 0 there, which
    silently skipped the rotation and left equal-norm parallel columns
    unresolved (wrong singular values, convergence measure never
    dropping)."""
    abs2c = c_re * c_re + c_im * c_im
    absc = jnp.sqrt(abs2c)
    safe = absc > 1e-30
    tau = jnp.where(safe, (b - a) / jnp.maximum(2 * absc, 1e-30), 0.0)
    sgn = jnp.where(tau >= 0, 1.0, -1.0)
    t_ = sgn / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
    t_ = jnp.where(safe, t_, 0.0)
    cs = 1.0 / jnp.sqrt(1 + t_ * t_)
    sn = cs * t_
    ph_re = jnp.where(safe, c_re / jnp.maximum(absc, 1e-30), 1.0)
    ph_im = jnp.where(safe, c_im / jnp.maximum(absc, 1e-30), 0.0)
    w1_re, w1_im = sn * ph_re, -sn * ph_im
    w2_re, w2_im = sn * ph_re, sn * ph_im
    return cs, w1_re, w1_im, w2_re, w2_im, t_, absc


def _jacobi_sweep_v_kernel(n: int):
    """ONE full tournament sweep over refs [G, m, n] rotating BOTH A and the
    V accumulator [G, n, n], with incremental column norms and the sweep's
    convergence measure emitted (max_pairs |c|^2 / sigma_max^4) so the
    caller's XLA-level while_loop can stop sweeping once converged -- same
    design as ``_jacobi_sweep_kernel`` (the V-free hot path), kept separate
    because the V rotations double the VMEM working set and the hot path
    must not pay for them.  A and V persist across sweeps via input/output
    aliasing; the caller initializes V = I."""
    k = n // 2
    steps_per_sweep = n - 1

    def kernel(inA_re, inA_im, inV_re, inV_im, A_re_ref, A_im_ref,
               V_re_ref, V_im_ref, off2_ref, ab_ref):
        A_re_ref[:] = inA_re[:]
        A_im_ref[:] = inA_im[:]
        V_re_ref[:] = inV_re[:]
        V_im_ref[:] = inV_im[:]
        ab_ref[:, 0, :] = jnp.sum(A_re_ref[:, :, :k] ** 2
                                  + A_im_ref[:, :, :k] ** 2, axis=1)
        ab_ref[:, 1, :] = jnp.sum(A_re_ref[:, :, k:] ** 2
                                  + A_im_ref[:, :, k:] ** 2, axis=1)
        ab_ref[:, 2, :] = jnp.zeros_like(ab_ref[:, 2, :])
        maxn2 = jnp.max(jnp.maximum(ab_ref[:, 0, :], ab_ref[:, 1, :]),
                        axis=1, keepdims=True)                    # [G, 1]
        inv_maxn2_sq = 1.0 / jnp.maximum(maxn2 * maxn2, 1e-30)

        def step(t, _):
            L_re, L_im = A_re_ref[:, :, :k], A_im_ref[:, :, :k]
            R_re, R_im = A_re_ref[:, :, k:], A_im_ref[:, :, k:]
            a = ab_ref[:, 0, :]
            b = ab_ref[:, 1, :]
            c_re = jnp.sum(L_re * R_re + L_im * R_im, axis=1)
            c_im = jnp.sum(L_re * R_im - L_im * R_re, axis=1)
            abs2c = c_re * c_re + c_im * c_im
            ratio = abs2c * inv_maxn2_sq
            ab_ref[:, 2, :] = jnp.maximum(ab_ref[:, 2, :], ratio)
            cs, w1_re, w1_im, w2_re, w2_im, t_, absc = _pair_rotation(
                a, b, c_re, c_im)
            cs_b = cs[:, None, :]
            w1_re_b, w1_im_b = w1_re[:, None, :], w1_im[:, None, :]
            w2_re_b, w2_im_b = w2_re[:, None, :], w2_im[:, None, :]

            def rot(XL_re, XL_im, XR_re, XR_im):
                u_re, u_im = XL_re, XL_im
                XL_re = cs_b * u_re - (w1_re_b * XR_re - w1_im_b * XR_im)
                XL_im = cs_b * u_im - (w1_re_b * XR_im + w1_im_b * XR_re)
                XR_re = (w2_re_b * u_re - w2_im_b * u_im) + cs_b * XR_re
                XR_im = (w2_re_b * u_im + w2_im_b * u_re) + cs_b * XR_im
                return XL_re, XL_im, XR_re, XR_im

            XL_re, XL_im, XR_re, XR_im = rot(L_re, L_im, R_re, R_im)
            VL_re, VL_im = V_re_ref[:, :, :k], V_im_ref[:, :, :k]
            VR_re, VR_im = V_re_ref[:, :, k:], V_im_ref[:, :, k:]
            VL_re, VL_im, VR_re, VR_im = rot(VL_re, VL_im, VR_re, VR_im)
            # 2x2 Jacobi norm update: a' = a - t|c|, b' = b + t|c|
            a_new = a - t_ * absc
            b_new = b + t_ * absc

            def cyc(L_, R_):
                # tournament: p=[p0, q0, p1..p_{k-2}], q=[q1.., p_{k-1}]
                newL = jnp.concatenate(
                    [L_[:, :, :1], R_[:, :, :1], L_[:, :, 1:k - 1]], axis=2)
                newR = jnp.concatenate([R_[:, :, 1:], L_[:, :, k - 1:]],
                                       axis=2)
                return newL, newR

            A_re_ref[:, :, :k], A_re_ref[:, :, k:] = cyc(XL_re, XR_re)
            A_im_ref[:, :, :k], A_im_ref[:, :, k:] = cyc(XL_im, XR_im)
            V_re_ref[:, :, :k], V_re_ref[:, :, k:] = cyc(VL_re, VR_re)
            V_im_ref[:, :, :k], V_im_ref[:, :, k:] = cyc(VL_im, VR_im)
            ab_ref[:, 0, :] = jnp.concatenate(
                [a_new[:, :1], b_new[:, :1], a_new[:, 1:k - 1]], axis=1)
            ab_ref[:, 1, :] = jnp.concatenate(
                [b_new[:, 1:], a_new[:, k - 1:]], axis=1)
            return 0

        jax.lax.fori_loop(0, steps_per_sweep, step, 0)
        off2 = jnp.max(ab_ref[:, 2, :]).astype(jnp.float32)
        off2_ref[0, :, :] = jnp.full((8, 128), off2, dtype=jnp.float32)

    return kernel


def _jacobi_sweep_kernel(n: int):
    """ONE full tournament sweep over refs [G, m, n], rotate-A-only: no V
    accumulation (the caller runs it on theta^H and reads V as the
    normalized rotated columns) and incremental column norms (a, b carried
    through the tournament, recomputed fresh at sweep start).  Emits the
    sweep's convergence measure max_pairs |c|^2 / sigma_max^4 (same
    measure as the V kernel) so the caller's
    XLA-level while_loop can stop sweeping early (TEBD thetas converge in
    far fewer sweeps than random matrices; in-kernel dynamic trip counts on
    vector-derived SMEM scalars proved unreliable under Mosaic, so the
    sweep loop lives outside)."""
    k = n // 2
    steps_per_sweep = n - 1

    def kernel(in_re_ref, in_im_ref, A_re_ref, A_im_ref, off2_ref,
               ab_ref):
        A_re_ref[:] = in_re_ref[:]
        A_im_ref[:] = in_im_ref[:]
        ab_ref[:, 0, :] = jnp.sum(A_re_ref[:, :, :k] ** 2
                                  + A_im_ref[:, :, :k] ** 2, axis=1)
        ab_ref[:, 1, :] = jnp.sum(A_re_ref[:, :, k:] ** 2
                                  + A_im_ref[:, :, k:] ** 2, axis=1)
        ab_ref[:, 2, :] = jnp.zeros_like(ab_ref[:, 2, :])
        # convergence-measure floor: columns whose norm^2 sits below
        # (64 eps)^2 * max-column-norm^2 are resolution-level noise (the
        # caller zeros them on output); their pairs stay mutually parallel
        # forever and must not gate convergence.
        maxn2 = jnp.max(jnp.maximum(ab_ref[:, 0, :], ab_ref[:, 1, :]),
                        axis=1, keepdims=True)                    # [G, 1]
        inv_maxn2_sq = 1.0 / jnp.maximum(maxn2 * maxn2, 1e-30)

        def step(t, _):
            L_re, L_im = A_re_ref[:, :, :k], A_im_ref[:, :, :k]
            R_re, R_im = A_re_ref[:, :, k:], A_im_ref[:, :, k:]
            a = ab_ref[:, 0, :]
            b = ab_ref[:, 1, :]
            c_re = jnp.sum(L_re * R_re + L_im * R_im, axis=1)
            c_im = jnp.sum(L_re * R_im - L_im * R_re, axis=1)
            abs2c = c_re * c_re + c_im * c_im
            # per-pair-slot running max of the convergence measure: pure
            # elementwise VMEM update inside the loop (vector->scalar
            # reductions on loop carries miscompile under Mosaic here);
            # reduced to one scalar after the loop.  Slot order is permuted
            # by the cycle, but max over slots is permutation-invariant.
            ratio = abs2c * inv_maxn2_sq
            ab_ref[:, 2, :] = jnp.maximum(ab_ref[:, 2, :], ratio)
            cs, w1_re, w1_im, w2_re, w2_im, t_, absc = _pair_rotation(
                a, b, c_re, c_im)
            cs_b = cs[:, None, :]
            w1_re_b, w1_im_b = w1_re[:, None, :], w1_im[:, None, :]
            w2_re_b, w2_im_b = w2_re[:, None, :], w2_im[:, None, :]
            u_re, u_im = L_re, L_im
            XL_re = cs_b * u_re - (w1_re_b * R_re - w1_im_b * R_im)
            XL_im = cs_b * u_im - (w1_re_b * R_im + w1_im_b * R_re)
            XR_re = (w2_re_b * u_re - w2_im_b * u_im) + cs_b * R_re
            XR_im = (w2_re_b * u_im + w2_im_b * u_re) + cs_b * R_im
            # 2x2 Jacobi norm update: a' = a - t|c|, b' = b + t|c|
            a_new = a - t_ * absc
            b_new = b + t_ * absc
            # rotate + tournament cycle fused on values
            A_re_ref[:, :, :k] = jnp.concatenate(
                [XL_re[:, :, :1], XR_re[:, :, :1], XL_re[:, :, 1:k - 1]],
                axis=2)
            A_im_ref[:, :, :k] = jnp.concatenate(
                [XL_im[:, :, :1], XR_im[:, :, :1], XL_im[:, :, 1:k - 1]],
                axis=2)
            A_re_ref[:, :, k:] = jnp.concatenate(
                [XR_re[:, :, 1:], XL_re[:, :, k - 1:]], axis=2)
            A_im_ref[:, :, k:] = jnp.concatenate(
                [XR_im[:, :, 1:], XL_im[:, :, k - 1:]], axis=2)
            ab_ref[:, 0, :] = jnp.concatenate(
                [a_new[:, :1], b_new[:, :1], a_new[:, 1:k - 1]], axis=1)
            ab_ref[:, 1, :] = jnp.concatenate(
                [b_new[:, 1:], a_new[:, k - 1:]], axis=1)
            return 0

        jax.lax.fori_loop(0, steps_per_sweep, step, 0)
        off2 = jnp.max(ab_ref[:, 2, :]).astype(jnp.float32)
        off2_ref[0, :, :] = jnp.full((8, 128), off2, dtype=jnp.float32)

    return kernel


def _flatten_lead(theta: C):
    """(flattened theta [B, m, n], lead_shape, flattened?) -- the kernels
    take ONE leading batch dim; callers with several (nested vmap-free
    batching, e.g. [grid, bonds, m, n]) are flattened here and outputs
    restored with ``_unflatten_lead``."""
    lead = theta.re.shape[:-2]
    if len(lead) <= 1:
        return theta, lead, False
    tail = theta.re.shape[-2:]
    return (C(theta.re.reshape((-1,) + tail), theta.im.reshape((-1,) + tail)),
            lead, True)


def _unflatten_lead(x, lead):
    if isinstance(x, C):
        return C(x.re.reshape(lead + x.re.shape[1:]),
                 x.im.reshape(lead + x.im.shape[1:]))
    return x.reshape(lead + x.shape[1:])


def _pick_block(Bn0: int, per_mat_bytes: int, budget_bytes: int) -> int:
    """Matrices per grid step: largest G within the VMEM budget that
    minimizes padding waste ceil(B/G)*G - B."""
    cap = max(1, min(Bn0, budget_bytes // max(per_mat_bytes, 1)))
    best, best_eff = 1, 0.0
    for G in range(1, cap + 1):
        eff = Bn0 / (((Bn0 + G - 1) // G) * G)
        if eff >= best_eff - 1e-12:
            if eff > best_eff + 1e-12 or G > best:
                best, best_eff = G, eff
    return best


def _ns_polish(V: C, pk: int, iters: int = 12) -> C:
    """Newton-Schulz re-orthonormalization of V's leading pk columns.

    The V-free kernel's small-sigma columns carry direction noise
    ~eps*sigma_max/sigma (normalized rotated columns, not accumulated
    rotations), which breaks mutual orthogonality -- and downstream MPS
    canonical form -- at the truncation boundary.  NS iteration converges
    to the nearest partial isometry: junk columns resolve into an
    orthonormal basis of their span (or zero for rank deficiency), good
    columns move by at most their own noise level.  Prescaling by 1/sqrt(2)
    keeps worst-case pairwise-parallel columns (sigma up to sqrt(2)) inside
    the NS convergence region; 12 iterations cover compiled-kernel defects
    up to ~0.3 (measured on adversarial dense-boundary spectra -> 8e-8
    residual).  All matmuls -> MXU; cost is negligible against the
    rotation kernel.
    """
    X = C(V.re[..., :, :pk], V.im[..., :, :pk]) * np.float32(1.0 / np.sqrt(2))
    eye = jnp.eye(pk, dtype=V.dtype)
    for _ in range(iters):
        P = cpx.einsum("...ji,...jk->...ik", X.conj(), X)
        corr = C(1.5 * eye - 0.5 * P.re, -0.5 * P.im)
        X = cpx.einsum("...ij,...jk->...ik", X, corr)
    re = jnp.concatenate([X.re, V.re[..., :, pk:]], axis=-1)
    im = jnp.concatenate([X.im, V.im[..., :, pk:]], axis=-1)
    return C(re, im)


def _ns_polish_adaptive(V: C, pk: int, max_iters: int, tol: float) -> C:
    """Adaptive-exit Newton-Schulz re-orthonormalization of the leading pk
    columns: the same iteration as ``_ns_polish``, under a lax.while_loop
    that exits once the gram defect max|X^H X - I| (max over the batch)
    drops below ``tol``.

    Production steady-state TEBD thetas exit in ~4-5 iterations (the
    1/sqrt(2) prescale alone costs ~3 scale-recovery iterations);
    adversarial dense-boundary spectra -- where the core kernel's
    boundary-column defect reaches ~1e-2 -- run toward the cap (measured
    on the compiled kernel: [4, 512, 256] logspace(0,-7) panels polish to
    9.5e-7 where a fixed 4-iteration polish left 1.0e-2).  This keeps the
    orthonormal-V contract input-independent without charging steep
    production spectra for the adversarial case.
    """
    X = C(V.re[..., :, :pk], V.im[..., :, :pk]) * np.float32(1.0 / np.sqrt(2))
    eye = jnp.eye(pk, dtype=V.dtype)

    def cond(carry):
        i, d, _, _ = carry
        return (i < max_iters) & (d >= np.asarray(tol, V.dtype))

    def body(carry):
        i, _, re, im = carry
        Xi = C(re, im)
        P = cpx.einsum("...ji,...jk->...ik", Xi.conj(), Xi)
        # NULL-SAFE defect: the NS fixed points are partial isometries
        # (column sigmas in {0, 1}), so max|P - I| never converges for a
        # null column (its zero diagonal reads as defect 1 forever).
        # Off-diagonals vanish at the fixed point regardless of rank
        # (a null column's row/col of P is exactly zero), and the scale
        # error 4*p_ii(1 - p_ii) vanishes at BOTH sigma = 0 and 1.
        diag = jnp.diagonal(P.re, axis1=-2, axis2=-1)
        off = jnp.max(jnp.abs(P.re - eye * P.re) + jnp.abs(P.im))
        d = jnp.maximum(off, jnp.max(4.0 * jnp.abs(diag * (1.0 - diag))))
        corr = C(1.5 * eye - 0.5 * P.re, -0.5 * P.im)
        Xn = cpx.einsum("...ij,...jk->...ik", Xi, corr)
        return (i + 1, d, Xn.re, Xn.im)

    _, _, re, im = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.asarray(jnp.inf, V.dtype),
                     X.re, X.im))
    re = jnp.concatenate([re, V.re[..., :, pk:]], axis=-1)
    im = jnp.concatenate([im, V.im[..., :, pk:]], axis=-1)
    return C(re, im)


def _rotate_single_pair(A: C):
    """Exact one-rotation one-sided Jacobi for a SINGLE column pair
    (n = 2), plain jnp: the tournament kernels' cycle shuffle is undefined
    for one pair (k = 1 malformed concat), and a lone pair needs no
    tournament -- one complex rotation orthogonalizes it exactly.  Returns
    (A', Vrot) with A' = A @ Vrot, same rotation convention as the
    kernels (u' = cs u - sn conj(ph) v; v' = sn ph u + cs v)."""
    L_re, L_im = A.re[..., :1], A.im[..., :1]
    R_re, R_im = A.re[..., 1:], A.im[..., 1:]
    a = jnp.sum(L_re * L_re + L_im * L_im, axis=-2)           # [B, 1]
    b = jnp.sum(R_re * R_re + R_im * R_im, axis=-2)
    c_re = jnp.sum(L_re * R_re + L_im * R_im, axis=-2)
    c_im = jnp.sum(L_re * R_im - L_im * R_re, axis=-2)
    cs, w1_re, w1_im, w2_re, w2_im, _, _ = _pair_rotation(a, b, c_re, c_im)
    cs_b = cs[..., None, :]
    w1_re_b, w1_im_b = w1_re[..., None, :], w1_im[..., None, :]
    w2_re_b, w2_im_b = w2_re[..., None, :], w2_im[..., None, :]
    nL_re = cs_b * L_re - (w1_re_b * R_re - w1_im_b * R_im)
    nL_im = cs_b * L_im - (w1_re_b * R_im + w1_im_b * R_re)
    nR_re = (w2_re_b * L_re - w2_im_b * L_im) + cs_b * R_re
    nR_im = (w2_re_b * L_im + w2_im_b * L_re) + cs_b * R_im
    Ap = C(jnp.concatenate([nL_re, nR_re], axis=-1),
           jnp.concatenate([nL_im, nR_im], axis=-1))
    # [u' v'] = [u v] @ Vrot, Vrot = [[cs, w2], [-w1, cs]]
    z = jnp.zeros_like(cs)
    Vrot_re = jnp.stack([jnp.concatenate([cs, w2_re], axis=-1),
                         jnp.concatenate([-w1_re, cs], axis=-1)], axis=-2)
    Vrot_im = jnp.stack([jnp.concatenate([z, w2_im], axis=-1),
                         jnp.concatenate([-w1_im, z], axis=-1)], axis=-2)
    return Ap, C(Vrot_re, Vrot_im)


def _orthogonalize_columns(A: C, max_sweeps: int, tol: float,
                           interpret: bool):
    """Run adaptive tournament sweeps on A C[B, m, n] (n even) until every
    pair overlap drops below tol * sigma_max^2 (or max_sweeps).  Returns the
    converged matrix whose columns are the left singular vectors of A scaled
    by its singular values (unsorted)."""
    Bn0, m, n = A.re.shape
    assert n % 2 == 0, "column count must be even for the tournament"
    if n == 2:
        Ap, _ = _rotate_single_pair(A)
        return Ap
    # per matrix resident: A re+im (input aliased to output) + rotation and
    # concat value temporaries.  Empirical scoped-VMEM footprint on v5e is
    # ~10x m*n*itemsize per matrix (measured 105 MB at G=10, n=512), so
    # budget 50 MB against that to stay clear of the 100 MB scoped limit.
    per_mat_bytes = (10 * m * n) * np.dtype(A.dtype).itemsize
    G = _pick_block(Bn0, per_mat_bytes, 50 * 2**20)
    pad = (-Bn0) % G
    if pad:
        A = C(jnp.concatenate([A.re, jnp.zeros((pad, m, n), A.dtype)]),
              jnp.concatenate([A.im, jnp.zeros((pad, m, n), A.dtype)]))
    Bn = Bn0 + pad

    kernel = _jacobi_sweep_kernel(n)
    n_blocks = Bn // G
    out_shape = [jax.ShapeDtypeStruct((Bn, m, n), A.dtype),
                 jax.ShapeDtypeStruct((Bn, m, n), A.dtype),
                 jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32)]
    block = pl.BlockSpec((G, m, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    off2_spec = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    sweep_call = pl.pallas_call(
        kernel, grid=(n_blocks,), out_shape=out_shape,
        in_specs=[block, block], out_specs=[block, block, off2_spec],
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[
            pltpu.VMEM((G, 3, n // 2), A.dtype),          # a, b norms + off-max
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    # sweep-until-converged at the XLA level: one kernel launch per sweep
    # (launches are device-side inside the jit program; the A blocks stay
    # resident per sweep and HBM round-trips between sweeps are ~1% of the
    # sweep's rotation time at n=512)
    def cond(carry):
        s, off2, _, _ = carry
        return (s < max_sweeps) & (off2 >= np.float32(tol * tol))

    def body(carry):
        s, _, re, im = carry
        re, im, off2b = sweep_call(re, im)
        return (s + 1, jnp.max(off2b), re, im)

    _, _, B_re, B_im = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.float32(jnp.inf), A.re, A.im))
    if pad:
        B_re, B_im = B_re[:Bn0], B_im[:Bn0]
    return C(B_re, B_im)


def _sigma_sort_floor(A: C, extras=()):
    """THE shared S-extraction convention for the rotated-column kernels
    (used by both ``_cols_to_sv`` and ``_usv_from_rotated`` so it cannot
    drift): column norms -> descending sort (any ``extras`` matrices'
    columns co-sorted) -> 64*eps*sigma_max resolution floor.

    Sigma below the floor is pure rotation noise in this dtype (weight
    <= (64 eps)^2 ~ 6e-11 in f32); their normalized columns are noise
    directions that can be mutually near-parallel, which would break the
    NS polish (sigma_max past sqrt(3)) -- zero both the sigma and (via
    the returned inv) the column.  Returns (S, A_sorted, inv, extras)."""
    S = jnp.sqrt(jnp.sum(cpx.abs2(A), axis=-2))
    order = jnp.argsort(-S, axis=-1)
    S = jnp.take_along_axis(S, order, axis=-1)
    A = C(jnp.take_along_axis(A.re, order[:, None, :], axis=-1),
          jnp.take_along_axis(A.im, order[:, None, :], axis=-1))
    extras = tuple(
        C(jnp.take_along_axis(e.re, order[:, None, :], axis=-1),
          jnp.take_along_axis(e.im, order[:, None, :], axis=-1))
        for e in extras)
    floor = 64.0 * float(jnp.finfo(A.dtype).eps)
    keep = S > floor * S[..., :1]
    S = jnp.where(keep, S, 0.0)
    inv = jnp.where(keep, 1.0 / jnp.maximum(S, 1e-30), 0.0)
    return S, A, inv, extras


def _cols_to_sv(Bm: C, polish: int):
    """Converged column matrix [B, m, n] (columns = vectors * sigma) ->
    (S [B, n] descending, Q C[B, m, n] normalized columns)."""
    S, Bm, inv, _ = _sigma_sort_floor(Bm)
    Q = C(Bm.re * inv[:, None, :], Bm.im * inv[:, None, :])
    if polish:
        Q = _ns_polish(Q, min(polish, Q.re.shape[-1]))
    return S, Q


@partial(jax.jit, static_argnames=("max_sweeps", "tol", "polish", "interpret"))
def jacobi_sv(theta: C, max_sweeps: int | None = None,
              tol: float | None = None, polish: int = 0,
              interpret: bool = False):
    """(S, V) of square theta C[..., n, n] -- the TEBD-update fast path.

    The two-site update consumes only (S, V) (core/truncate.py uses S_top,
    Vh_top, theta_tilde; U is never formed), and SVD(theta^H) = V S U^H, so
    running the one-sided kernel on A = theta^H yields V directly as the
    NORMALIZED ROTATED COLUMNS -- no V accumulator in the kernel at all.
    That halves the rotation flops and VMEM per matrix vs ``jacobi_svd``;
    on top of it the kernel carries incremental column norms and the sweep
    loop exits early once a full sweep sees every pair overlap below
    tol * sigma_max^2 (L=40 chi=256 TEBD thetas converge in ~8-10 sweeps;
    low-rank early-evolution thetas in fewer; random matrices use up to
    max_sweeps).

    S descending; V's columns for sigma ~ 0 carry direction noise
    ~eps*sigma_max/sigma (they are masked to zero by truncation downstream,
    same convention as jacobi_svd's U).
    """
    if max_sweeps is None:
        max_sweeps = 24 if theta.dtype == jnp.float64 else 12
    if tol is None:
        # absolute measure: exit once max_pairs |<L,R>| <= tol * sigma_max^2.
        # Calibrated on L=40 chi=256 TEBD thetas AND end-to-end L=16 traces
        # vs the exact oracle: tol=3e-8 exits after ~10 sweeps (S err ~1e-6,
        # end-to-end trace error ~3e-5 over 40 periods -- matching the
        # V-accumulating kernel's quality); looser 1e-6 exits ~2 sweeps
        # earlier but costs ~1 digit end-to-end because the normalized-
        # column V needs full convergence at the small-sigma scale.
        tol = 1e-14 if theta.dtype == jnp.float64 else 3e-8
    squeeze = theta.ndim == 2
    if squeeze:
        theta = C(theta.re[None], theta.im[None])
    theta, lead, flat = _flatten_lead(theta)
    Bn0, m, n = theta.re.shape
    assert m == n and n % 2 == 0, "jacobi_sv requires square even-n theta"
    # A = theta^H: orthogonalized columns become V*S
    A = C(jnp.swapaxes(theta.re, -1, -2), -jnp.swapaxes(theta.im, -1, -2))
    Bm = _orthogonalize_columns(A, max_sweeps, tol, interpret)   # = V S
    S, V = _cols_to_sv(Bm, polish)
    if flat:
        S, V = _unflatten_lead(S, lead), _unflatten_lead(V, lead)
    if squeeze:
        S, V = S[0], V[0]
    return S, V


_PROJ_BASES: dict = {}


def _fixed_projection_basis(n: int, k: int, dtype) -> C:
    """Deterministic orthonormal basis Q0 [n, k] (complex, host-generated,
    embedded as a jit constant).  The chained projected SVD's capture
    quality is basis-INDEPENDENT on TEBD thetas -- the steep spectrum at
    the truncation boundary makes one theta-application from any generic
    subspace sufficient (measured: cold random carrier Serr 2.95e-5 ==
    threaded carrier 3.1e-5; baselines/chained_proj_experiment.py) -- so a
    fixed basis replaces carried state entirely."""
    key = (n, k, jnp.dtype(dtype).name)
    if key not in _PROJ_BASES:
        rng = np.random.default_rng(0x7C0FFEE)
        Q, _ = np.linalg.qr(rng.standard_normal((n, k))
                            + 1j * rng.standard_normal((n, k)))
        _PROJ_BASES[key] = (np.ascontiguousarray(Q.real.astype(jnp.dtype(dtype))),
                            np.ascontiguousarray(Q.imag.astype(jnp.dtype(dtype))))
    re, im = _PROJ_BASES[key]
    return C(jnp.asarray(re), jnp.asarray(im))


@partial(jax.jit, static_argnames=("k", "max_sweeps", "tol", "tol_b",
                                   "polish", "polish_b_iters",
                                   "polish_iters", "interpret"))
def jacobi_proj(theta: C, k: int, max_sweeps: int | None = None,
                tol: float | None = None, tol_b: float | None = None,
                polish: int = 0, polish_b_iters: int = 12,
                polish_iters: int = 12,
                interpret: bool = False):
    """Chained half-power projected top-k SVD: (S [.., k], V C[.., n, k],
    disc [..]) of theta C[.., m, n] -- the saturated-chi steady-state fast
    path (k = chi = n/2 cuts per-sweep rotation traffic ~4x vs the full
    kernel).

    Both restrictions are sigma-weighted (f32-resolvable; theta^H-theta
    panels would put the truncation boundary below the f32 noise floor)
    and every orthonormalization is done BY the Jacobi kernel (QR/Cholesky/
    NS-orth are unavailable or unstable in f32 on this backend):

      1. T = theta Q0        [m, k]  (Q0 fixed orthonormal: capture of the
                                      LEFT subspace after one application
                                      is tail-weight-bound, ~1e-6 measured)
      2. jacobi(T) -> U-hat  [m, k]  (normalized converged columns + NS
                                      polish: U-hat's orthonormality enters
                                      S directly)
      3. Y = theta^H U-hat   [n, k]  (columns ~ sigma_i v_i: near-orthogonal,
                                      pair overlap ~3e-2 measured)
      4. jacobi(Y): S = column norms, V = normalized columns (few sweeps).

    Soundness + error model measured in baselines/chained_proj_experiment.py
    (L=40 chi=256 steady state): S err ~3e-5..1e-4 concentrated on boundary
    singular values, kept-weight misplacement ~1e-6..3e-6, stable across
    threaded periods.  disc = ||theta||_F^2 - sum S^2 (includes the
    projection leak -- conservative).  Requires k even and k <= min(m, n);
    intended for saturated steady-state evolution where rank chi is filled
    (rank-deficient inputs degrade gracefully: junk directions carry
    sigma ~ 0 and are floor-zeroed).
    """
    if max_sweeps is None:
        max_sweeps = 24 if theta.dtype == jnp.float64 else 12
    if tol is None:
        tol = 1e-14 if theta.dtype == jnp.float64 else 3e-8
    if tol_b is None:
        tol_b = tol
    squeeze = theta.ndim == 2
    if squeeze:
        theta = C(theta.re[None], theta.im[None])
    theta, lead, flat = _flatten_lead(theta)
    Bn0, m, n = theta.re.shape
    assert k % 2 == 0 and k <= min(m, n), "jacobi_proj needs even k <= min(m, n)"
    Q0 = _fixed_projection_basis(n, k, theta.dtype)
    T = cpx.einsum("bmn,nk->bmk", theta, Q0)
    Tm = _orthogonalize_columns(T, max_sweeps, tol_b, interpret)
    _, Uhat = _cols_to_sv(Tm, polish=0)
    if polish_b_iters:
        Uhat = _ns_polish(Uhat, k, iters=polish_b_iters)
    Y = cpx.einsum("bmn,bmk->bnk", theta.conj(), Uhat)
    Ym = _orthogonalize_columns(Y, max_sweeps, tol, interpret)
    S, V = _cols_to_sv(Ym, polish=0)
    if polish:
        V = _ns_polish(V, min(polish, k), iters=polish_iters)
    disc = jnp.sum(cpx.abs2(theta), axis=(-2, -1)) - jnp.sum(S * S, axis=-1)
    disc = jnp.maximum(disc, 0.0)
    if flat:
        S = _unflatten_lead(S, lead)
        V = _unflatten_lead(V, lead)
        disc = _unflatten_lead(disc, lead)
    if squeeze:
        S, V, disc = S[0], V[0], disc[0]
    return S, V, disc


# Muon-class quintic coefficients for _poly_polar: p(x) = a x + b x^3 + c x^5
# maps (0, 1] toward 1 with slope a at 0 (small sigmas grow ~3.4x per
# iteration) while |p| stays <= ~1.09 on [0, 1.09]; the cubic NS tail
# (1.5, -0.5) then contracts the band quadratically to the dtype floor.
_QUINTIC_A, _QUINTIC_B, _QUINTIC_C = 3.4445, -4.7750, 2.0315


def _poly_polar(X: C, q_iters: int, c_iters: int,
                q_precision: str = "highest") -> C:
    """Polynomial polar orthonormalization of X C[B, m, k]: all MXU matmuls.

    Returns W with W^H W ~ I on the span of X's non-null directions; exact
    zero singular values stay exactly zero (p(0) = 0), so rank deficiency
    is benign -- unlike the Loewdin (X^H X)^{-1/2} NS-orth that died on it
    in baselines/rrsvd_experiment.py.  The Frobenius prescale guarantees
    sigma_max <= 1 at the cost of ~log_3.4(sqrt(k)) extra quintic
    iterations, which are cheap [k, k] matmuls.

    ``q_precision`` runs the QUINTIC stage at a cheaper matmul precision
    (f32 'default' = one bf16 MXU pass instead of 'highest''s six): the
    quintic iterations only GROW small sigmas toward 1 and W <- W @ coef
    keeps columns in span(W) exactly, so matmul rounding perturbs only
    the mixing; the cubic tail always runs at 'highest' and contracts
    the orthogonality defect quadratically back to the dtype floor
    (measured on settled L=40 chi=256 thetas: kept-weight misplacement
    1.2e-6 -> 3.5e-6, same class, for a 1.2x jacobi_core speedup --
    baselines/core_anatomy_experiment.py).
    """
    nrm = jnp.sqrt(jnp.sum(cpx.abs2(X), axis=(-2, -1), keepdims=True))
    inv = jnp.where(nrm > 0, 1.0 / jnp.maximum(nrm, 1e-30), 0.0)
    W = C(X.re * inv, X.im * inv)
    k = X.re.shape[-1]
    eye = jnp.eye(k, dtype=X.dtype)
    qes = partial(jnp.einsum, precision=q_precision)

    def qmul(a: C, b: C) -> C:
        return C(qes("...ij,...jk->...ik", a.re, b.re)
                 - qes("...ij,...jk->...ik", a.im, b.im),
                 qes("...ij,...jk->...ik", a.re, b.im)
                 + qes("...ij,...jk->...ik", a.im, b.re))

    for _ in range(q_iters):
        Wh = C(jnp.swapaxes(W.re, -1, -2), -jnp.swapaxes(W.im, -1, -2))
        G = qmul(Wh, W)
        G2 = qmul(G, G)
        coef = C(_QUINTIC_A * eye + _QUINTIC_B * G.re + _QUINTIC_C * G2.re,
                 _QUINTIC_B * G.im + _QUINTIC_C * G2.im)
        W = qmul(W, coef)
    for _ in range(c_iters):
        G = cpx.einsum("...ji,...jk->...ik", W.conj(), W)
        coef = C(1.5 * eye - 0.5 * G.re, -0.5 * G.im)
        W = cpx.einsum("...ij,...jk->...ik", W, coef)
    return W


@partial(jax.jit, static_argnames=("k", "q_iters", "c_iters", "max_sweeps",
                                   "tol", "polish_iters", "quintic_precision",
                                   "polish_adaptive", "interpret"))
def jacobi_core(theta: C, k: int, q_iters: int | None = None,
                c_iters: int | None = None, max_sweeps: int | None = None,
                tol: float | None = None, polish_iters: int = 12,
                quintic_precision: str | None = None,
                polish_adaptive: bool = True,
                interpret: bool = False):
    """Core-matrix projected top-k SVD: (S [.., k], V C[.., n, k], disc)
    of theta C[.., m, n] -- the fastest saturated-chi steady-state path
    (ROADMAP's "all-matmul inner eigensolver" lever, landed).

    ``jacobi_proj`` spends its time in TWO Jacobi runs on [m, k] panels.
    A plain polynomial polar cannot replace its step 2 one-for-one (the
    polar's output basis is singular-UNALIGNED, which would push the full
    sweep cost into step 4) -- but it CAN build both subspace bases, after
    which ONE Jacobi run on the small k x k core matrix does all the
    aligning:

      1. T = theta Q0          [m, k]  (fixed generic basis, as jacobi_proj)
      2. W = _poly_polar(T)    [m, k]  (left-subspace basis, MXU matmuls)
      3. Y = theta^H W         [n, k]  (second power application: right-
                                        subspace capture, tail-weight-bound)
      4. Z = _poly_polar(Y)    [n, k]
      5. P = theta Z           [m, k]
      6. K = W^H P             [k, k]  (sigma-weighted restriction: no Gram
                                        squaring, boundary sigmas stay
                                        f32-resolvable)
      7. jacobi(K^H) -> S, Vk          (the ONLY rotation kernel: k-row
                                        columns = HALF the VMEM rotation
                                        bytes per sweep of an [2k, k] panel)
      8. V = Z Vk (+ NS polish).

    Measured on L=40 chi=256 settled thetas ([512, 512] batch of 20,
    baselines/polar_core_experiment.py): 41 ms vs jacobi_proj's 84 ms and
    jacobi_sv's 205 ms, kept-weight misplacement 1.2e-6 (BETTER than
    jacobi_proj's 2.4e-5 on the same check), S err ~4.4e-5 boundary-
    concentrated.  Rank-deficient inputs are benign (p(0) = 0 keeps null
    directions zero; the final Jacobi floor-zeros their sigmas) -- V's
    null columns are exact zeros, masked by truncation downstream like
    every rotated-column kernel here.  disc includes the projection leak
    (conservative).  Closed-loop physics gating: see
    baselines/jacobi_core_closedloop.py and PERFORMANCE.md round 3.
    """
    if q_iters is None:
        # f32: growth log_3.4(prescaled sigma_min^-1) ~ 10 covers the TEBD
        # steep spectrum (3.6e-5 x sigma_max over sqrt(k) prescale); f64
        # adds headroom for the deeper noise floor
        q_iters = 16 if theta.dtype == jnp.float64 else 10
    if c_iters is None:
        # cubic tail is quadratically convergent: 4 contracts a ~0.1 band
        # to the f32 floor, 8 to the f64 floor
        c_iters = 8 if theta.dtype == jnp.float64 else 4
    if max_sweeps is None:
        max_sweeps = 24 if theta.dtype == jnp.float64 else 12
    if tol is None:
        # the core matrix K is sigma-aligned only after the Jacobi run;
        # 1e-6 matches the tuned jacobi_proj class (the NS polish of V
        # resolves the looser-tol defects, same argument as csvd_topk's
        # tuned jacobi_proj config)
        tol = 1e-14 if theta.dtype == jnp.float64 else 1e-6
    if quintic_precision is None:
        # SAFE default for every input class.  'default' (single-pass bf16
        # quintic matmuls) is 1.2x faster and closed-loop-validated on
        # saturated TEBD spectra (steep boundary, tiny tail) -- but on
        # DENSE near-boundary spectra bf16 gram rounding (eps ~ 8e-3)
        # collapses boundary directions into collinear columns, an
        # orthonormality defect (measured 0.16 on [512,512] logspace(0,-7)
        # panels) that NO amount of NS polish can repair (polish fixes
        # scale, not span collapse).  Opt in per call, or via
        # csvd.csvd_topk(method='jacobi_core_fast') on workloads where the
        # spectrum class is known (the steady-state bench does).
        quintic_precision = "highest"
    squeeze = theta.ndim == 2
    if squeeze:
        theta = C(theta.re[None], theta.im[None])
    theta, lead, flat = _flatten_lead(theta)
    Bn0, m, n = theta.re.shape
    assert k % 2 == 0 and k <= min(m, n), "jacobi_core needs even k <= min(m, n)"
    Q0 = _fixed_projection_basis(n, k, theta.dtype)
    T = cpx.einsum("bmn,nk->bmk", theta, Q0)
    W = _poly_polar(T, q_iters, c_iters, quintic_precision)
    Y = cpx.einsum("bmn,bmk->bnk", theta.conj(), W)
    Z = _poly_polar(Y, q_iters, c_iters, quintic_precision)
    P = cpx.einsum("bmn,bnk->bmk", theta, Z)
    K = cpx.einsum("bmk,bml->bkl", W.conj(), P)
    Kh = C(jnp.swapaxes(K.re, -1, -2), -jnp.swapaxes(K.im, -1, -2))
    Km = _orthogonalize_columns(Kh, max_sweeps, tol, interpret)
    S, Vk = _cols_to_sv(Km, polish=0)
    V = cpx.einsum("bnk,bkl->bnl", Z, Vk)
    if polish_iters and polish_adaptive:
        # adaptive (the default): steep production spectra exit in a few
        # iterations, adversarial dense-boundary spectra run toward the
        # cap -- the orthonormal-V contract must hold for EVERY input (a
        # fixed 4-iteration polish left a 1e-2 defect on dense spectra,
        # caught by tests/test_tpu_smoke.py::test_compiled_jacobi_core*).
        # polish_adaptive=False + a small polish_iters is the measured
        # closed-loop-gated fast config for saturated TEBD spectra
        # (csvd_topk method 'jacobi_core_fast').
        ptol = 1e-12 if theta.dtype == jnp.float64 else 5e-6
        V = _ns_polish_adaptive(V, k, max_iters=polish_iters, tol=ptol)
    elif polish_iters:
        V = _ns_polish(V, k, iters=polish_iters)
    disc = jnp.sum(cpx.abs2(theta), axis=(-2, -1)) - jnp.sum(S * S, axis=-1)
    disc = jnp.maximum(disc, 0.0)
    if flat:
        S = _unflatten_lead(S, lead)
        V = _unflatten_lead(V, lead)
        disc = _unflatten_lead(disc, lead)
    if squeeze:
        S, V, disc = S[0], V[0], disc[0]
    return S, V, disc


@partial(jax.jit, static_argnames=("n_sweeps", "tol", "interpret"))
def jacobi_svd(theta: C, n_sweeps: int | None = None,
               tol: float | None = None, interpret: bool = False):
    """Batched one-sided Jacobi SVD: theta C[B, m, n] -> (U, S, Vh).

    S descending; U's columns for sigma ~ 0 are zero (padded convention).
    Sweeps are ADAPTIVE: an XLA-level while_loop launches one-sweep kernels
    until the sweep's max pair overlap drops below ``tol * sigma_max^2``
    (same exit as the V-free hot path ``jacobi_sv``), capped at
    ``n_sweeps`` (default 12 f32 / 24 f64).  TEBD thetas converge in
    ~8-10 sweeps at L=40 chi=256; worst-case random matrices use the cap.
    Odd column counts are zero-padded to even (the extra zero column never
    rotates and sorts to the tail as sigma = 0).
    """
    if n_sweeps is None:
        n_sweeps = 24 if theta.dtype == jnp.float64 else 12
    if tol is None:
        tol = 1e-14 if theta.dtype == jnp.float64 else 3e-8
    squeeze = theta.ndim == 2
    if squeeze:
        theta = C(theta.re[None], theta.im[None])
    theta, lead, flat = _flatten_lead(theta)
    Bn0, m, n0 = theta.re.shape
    col_pad = n0 % 2
    if col_pad:
        zc = jnp.zeros((Bn0, m, 1), theta.dtype)
        theta = C(jnp.concatenate([theta.re, zc], axis=-1),
                  jnp.concatenate([theta.im, zc], axis=-1))
    n = n0 + col_pad

    if n == 2:
        # single pair: the tournament cycle is undefined for k = 1 and
        # unnecessary -- one exact jnp rotation replaces the kernel
        Ap, Vrot = _rotate_single_pair(theta)
        A_re, A_im = Ap.re, Ap.im
        V_re, V_im = Vrot.re, Vrot.im
        if col_pad:
            A_re, A_im = A_re[..., :n0], A_im[..., :n0]
            V_re, V_im = V_re[..., :n0, :n0], V_im[..., :n0, :n0]
        return _usv_from_rotated(C(A_re, A_im), C(V_re, V_im), squeeze,
                                 lead, flat)

    # matrices per grid step: empirical scoped-VMEM footprint is ~10x the
    # resident arrays (rotation/cycle value temporaries); A is [m, n] re+im
    # and V is [n, n] re+im, both in/out aliased.  Budget 50 MB against the
    # 100 MB scoped limit (same calibration as jacobi_sv).
    per_mat_bytes = (10 * (m * n + n * n)) * np.dtype(theta.dtype).itemsize
    G = _pick_block(Bn0, per_mat_bytes, 50 * 2**20)
    pad = (-Bn0) % G
    if pad:
        theta = C(jnp.concatenate([theta.re, jnp.zeros((pad, m, n), theta.dtype)]),
                  jnp.concatenate([theta.im, jnp.zeros((pad, m, n), theta.dtype)]))
    Bn = Bn0 + pad

    kernel = _jacobi_sweep_v_kernel(n)
    n_blocks = Bn // G
    out_shape = [
        jax.ShapeDtypeStruct((Bn, m, n), theta.dtype),
        jax.ShapeDtypeStruct((Bn, m, n), theta.dtype),
        jax.ShapeDtypeStruct((Bn, n, n), theta.dtype),
        jax.ShapeDtypeStruct((Bn, n, n), theta.dtype),
        jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32),
    ]
    block_a = pl.BlockSpec((G, m, n), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    block_v = pl.BlockSpec((G, n, n), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    off2_spec = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    sweep_call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=out_shape,
        in_specs=[block_a, block_a, block_v, block_v],
        out_specs=[block_a, block_a, block_v, block_v, off2_spec],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3},
        scratch_shapes=[
            pltpu.VMEM((G, 3, n // 2), theta.dtype),      # a, b norms + off-max
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    V0_re = jnp.broadcast_to(jnp.eye(n, dtype=theta.dtype)[None], (Bn, n, n))
    V0_im = jnp.zeros((Bn, n, n), theta.dtype)

    def cond(carry):
        s, off2 = carry[0], carry[1]
        return (s < n_sweeps) & (off2 >= np.float32(tol * tol))

    def body(carry):
        s, _, A_re, A_im, V_re, V_im = carry
        A_re, A_im, V_re, V_im, off2b = sweep_call(A_re, A_im, V_re, V_im)
        return (s + 1, jnp.max(off2b), A_re, A_im, V_re, V_im)

    _, _, A_re, A_im, V_re, V_im = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.float32(jnp.inf), theta.re, theta.im,
         V0_re, V0_im))
    if pad:
        A_re, A_im = A_re[:Bn0], A_im[:Bn0]
        V_re, V_im = V_re[:Bn0], V_im[:Bn0]
    if col_pad:
        # the zero pad column never rotates (|c| = 0 pairs are skipped) and
        # the tournament returns columns to original order after each full
        # sweep, so it sits exactly at index n-1 with V column e_{n-1};
        # dropping the last column (and V's pad coordinate row) is exact.
        A_re, A_im = A_re[..., :n0], A_im[..., :n0]
        V_re, V_im = V_re[..., :n0, :n0], V_im[..., :n0, :n0]

    return _usv_from_rotated(C(A_re, A_im), C(V_re, V_im), squeeze,
                             lead, flat)


def _usv_from_rotated(A: C, V: C, squeeze: bool, lead=(), flat: bool = False):
    """(U, S, Vh) from an orthogonalized-column A and its accumulated
    rotation V: the shared ``_sigma_sort_floor`` convention (V's columns
    co-sorted), then normalize -- converged zero-columns of a
    rank-deficient input carry rounding-noise norms ~eps*sigma_max, and
    the documented convention is that their sigmas AND U columns are
    zero, not unit-norm noise directions."""
    S, A, inv, (V,) = _sigma_sort_floor(A, (V,))
    U = C(A.re * inv[:, None, :], A.im * inv[:, None, :])
    Vh = V.conj().transpose(0, 2, 1)
    if flat:
        U = _unflatten_lead(U, lead)
        S = _unflatten_lead(S, lead)
        Vh = _unflatten_lead(Vh, lead)
    if squeeze:
        U, S, Vh = U[0], S[0], Vh[0]
    return U, S, Vh
