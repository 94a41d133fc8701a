"""Complex SVD for TPU backends without native SVD or complex dtypes.

The axon TPU backend (the deployment target) implements neither complex
dtypes nor ``lax.linalg.svd`` (UNIMPLEMENTED for float32 and complex64 --
verified empirically; only real eigh/qr/cholesky/matmul exist).  This module
provides the truncated-SVD primitive the TEBD two-site update needs
(SURVEY.md section 2.2 "implicit native kernels": LAPACK gesdd inside
TeNPy), with two interchangeable backends:

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
      3. masked Gram-Schmidt scan over the 2n candidate complex vectors to
         select n orthonormal right-singular vectors (rejects each
         J-duplicate; robust to degenerate clusters),
      4. singular values as column norms of theta V (computed unsquared,
         so large sigma keep full f32 accuracy; sigma below
         ~sqrt(eps_f32)*sigma_max are resolution-limited -- they sit below
         any physical truncation cutoff used here).

A Pallas one-sided Jacobi kernel (ops/pallas/) can replace gram_eigh where
higher small-sigma accuracy on TPU is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import cpx
from .cpx import C


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


def _svd_gram_eigh(theta: C):
    """TPU-native complex SVD via Gram matrix + real-embedded eigh."""
    m, n = theta.shape[-2:]
    if m != n:
        raise NotImplementedError("gram_eigh SVD implemented for square theta")
    # G = theta^H theta  (Hermitian)
    G = cpx.einsum("ji,jk->ik", theta.conj(), theta)
    Rg = cpx.real_embedding(G)                       # [2n, 2n] real symmetric
    w, W = jnp.linalg.eigh(Rg)                       # ascending
    W = W[:, ::-1]                                   # descending importance
    cands = C(W[:n, :], W[n:, :])                    # [n, 2n] complex columns
    V = _orthonormal_select(cands, n)                # [n, n]
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
    return U, S, Vh


def csvd(theta: C, method: str = "auto"):
    """Batched complex SVD: theta [..., m, n] -> (U, S, Vh), S descending.

    method: 'native' (complex LAPACK; CPU), 'gram_eigh' (TPU), or 'auto'
    (native on CPU backend, gram_eigh otherwise).
    """
    if method == "auto":
        method = "native" if jax.default_backend() == "cpu" else "gram_eigh"
    fn = _svd_native if method == "native" else _svd_gram_eigh
    ndim = theta.ndim
    if ndim == 2:
        return fn(theta)
    # vmap over leading batch dims
    f = fn
    for _ in range(ndim - 2):
        f = jax.vmap(f)
    return f(theta)
