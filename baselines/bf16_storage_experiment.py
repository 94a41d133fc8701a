"""bf16 VMEM storage for the Jacobi sweep kernel: measured DEAD ON ARRIVAL.

Round-2 VERDICT lever (a): "bf16 storage of A with f32 compensated
accumulation in the rotation kernel (halves traffic, potentially ~2x)".
The accounting error in that idea: compensated f32 accumulation protects a
MATMUL, where each output element is STORED ONCE after a long in-register
accumulation.  The one-sided Jacobi kernel is the opposite shape -- every
matrix element is rewritten through storage at every tournament step it
participates in (n-1 steps/sweep x ~10 sweeps at n=512), so the STORAGE
precision enters multiplicatively ~5000 times per element.  bf16's 8-bit
mantissa (eps ~ 7.8e-3) then compounds as a random walk:
err ~ sqrt(n_rewrites) * eps_bf16 ~ 0.5 relative -- far beyond any
truncation-class tolerance, and orders of magnitude beyond the production
kernel's 7.5e-6 S error.

This script MEASURES that prediction on host (NumPy, bit-exact simulation
of per-step bf16 rounding of the stored re/im pairs; angle/overlap math in
f32 exactly as the kernel would do after upcasting loads).  Spectra are
TEBD-steady-state-like (geomspace 1 -> 3.6e-5, the measured chi=256
boundary ratio, PERFORMANCE.md).  No TPU required: the question is purely
numerical.

Result (recorded in PERFORMANCE.md "measured-negative levers"): bf16
storage S err ~1e-1..1 relative on kept singular values vs f32 storage's
~1e-6 -- the 2x bandwidth saving cannot be bought at any acceptable
accuracy, closing VERDICT lever (a) by measurement.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

try:
    from ml_dtypes import bfloat16
except ImportError:                                   # ships with jax
    bfloat16 = None


def _rotate_pairing(L, R):
    newL = np.concatenate([L[..., :1], R[..., :1], L[..., 1:-1]], axis=-1)
    newR = np.concatenate([R[..., 1:], L[..., -1:]], axis=-1)
    return newL, newR


def _round_storage(X, storage):
    """Simulate writing the complex columns to VMEM at ``storage`` dtype
    (re/im pairs separately, exactly as the kernel stores them)."""
    if storage == "f32":
        return X.astype(np.complex64)
    re = X.real.astype(bfloat16).astype(np.float32)
    im = X.imag.astype(bfloat16).astype(np.float32)
    return (re + 1j * im).astype(np.complex64)


def one_sided_jacobi_stored(M, n_sweeps, storage):
    """V-free one-sided Jacobi (the jacobi_sv hot path's math) with the
    working matrix round-tripped through ``storage`` after EVERY rotation
    step -- the precision behavior a bf16-resident VMEM kernel would have.
    All arithmetic (overlaps, angles, rotations) is f32, as the kernel
    would compute after upcasting its loads."""
    m, n = M.shape
    k = n // 2
    A = _round_storage(M, storage)
    A_L, A_R = A[:, :k].copy(), A[:, k:].copy()
    for sweep in range(n_sweeps):
        for step in range(n - 1):
            a = np.sum(np.abs(A_L) ** 2, axis=0).astype(np.float32)
            b = np.sum(np.abs(A_R) ** 2, axis=0).astype(np.float32)
            c = np.sum(np.conj(A_L) * A_R, axis=0).astype(np.complex64)
            absc = np.abs(c)
            safe = absc > 1e-30
            tau = np.where(safe, (b - a) / np.maximum(2 * absc, 1e-30), 0.0)
            sgn = np.where(tau >= 0, 1.0, -1.0)
            t = sgn / (np.abs(tau) + np.sqrt(1 + tau * tau))
            t = np.where(safe, t, 0.0).astype(np.float32)
            cs = (1.0 / np.sqrt(1 + t * t)).astype(np.float32)
            sn = cs * t
            phase = np.where(safe, c / np.maximum(absc, 1e-30),
                             1.0).astype(np.complex64)
            w1 = sn * np.conj(phase)
            w2 = sn * phase
            u = A_L.copy()
            A_L = _round_storage(cs[None, :] * u - w1[None, :] * A_R, storage)
            A_R = _round_storage(w2[None, :] * u + cs[None, :] * A_R, storage)
            A_L, A_R = _rotate_pairing(A_L, A_R)
    A = np.concatenate([A_L, A_R], axis=1)
    S = np.linalg.norm(A, axis=0)
    return np.sort(S)[::-1]


def run(n, sweeps):
    rng = np.random.default_rng(42)
    U0, _ = np.linalg.qr(rng.standard_normal((n, n))
                         + 1j * rng.standard_normal((n, n)))
    V0, _ = np.linalg.qr(rng.standard_normal((n, n))
                         + 1j * rng.standard_normal((n, n)))
    # TEBD-steady-state-like spectrum: boundary ratio 3.6e-5 (measured at
    # L=40 chi=256, PERFORMANCE.md)
    s_true = np.geomspace(1.0, 3.6e-5, n)
    M = (U0 * s_true[None, :]) @ V0.conj().T
    kept = slice(0, n // 2)          # truncation keeps the top half
    print(f"n={n}, {sweeps} sweeps, spectrum 1 -> 3.6e-5:")
    for storage in ("f32", "bf16"):
        S = one_sided_jacobi_stored(M, sweeps, storage)
        rel = np.abs(S[kept] - s_true[kept]) / s_true[kept]
        wmis = abs(float(np.sum(S[kept] ** 2) - np.sum(s_true[kept] ** 2)))
        print(f"  storage={storage}: kept-S rel err max={rel.max():.2e} "
              f"median={np.median(rel):.2e}; kept-weight err={wmis:.2e}",
              flush=True)


if __name__ == "__main__":
    if bfloat16 is None:
        print("ml_dtypes unavailable; cannot simulate bf16 storage")
        sys.exit(0)
    run(128, 10)
    run(256, 10)
