"""NumPy prototype of parallel one-sided complex Jacobi SVD.

Validates the rotation math and the circle (round-robin) parallel ordering
before the Pallas port (ops/pallas/jacobi_svd.py).  Columns are kept as two
halves L | R paired elementwise; after each parallel step the pairing
rotates via the classic tournament scheme (position 0 fixed).
"""

import numpy as np


def _rotate_pairing(L, R):
    """Circle method: p = [p0, q0, p1..p_{k-2}], q = [q1..q_{k-1}, p_{k-1}].

    L, R: arrays whose LAST axis indexes the k pair positions."""
    newL = np.concatenate([L[..., :1], R[..., :1], L[..., 1:-1]], axis=-1)
    newR = np.concatenate([R[..., 1:], L[..., -1:]], axis=-1)
    return newL, newR


def one_sided_jacobi(M, n_sweeps=10, tol=0.0):
    """SVD of square complex M [m, n]: returns (U, S, Vh), S descending."""
    m, n = M.shape
    assert n % 2 == 0
    k = n // 2
    A_L, A_R = M[:, :k].copy(), M[:, k:].copy()
    V = np.eye(n, dtype=complex)
    V_L, V_R = V[:, :k].copy(), V[:, k:].copy()

    for sweep in range(n_sweeps):
        off_max = 0.0
        for step in range(n - 1):
            a = np.sum(np.abs(A_L) ** 2, axis=0)          # [k]
            b = np.sum(np.abs(A_R) ** 2, axis=0)
            c = np.sum(np.conj(A_L) * A_R, axis=0)        # [k] complex
            absc = np.abs(c)
            off_max = max(off_max, float(np.max(
                absc / np.maximum(np.sqrt(a * b), 1e-300))))
            # rotation angles (guard zero |c|: identity rotation)
            safe = absc > 1e-300
            tau = np.where(safe, (b - a) / np.maximum(2 * absc, 1e-300), 0.0)
            t = np.sign(tau) / (np.abs(tau) + np.sqrt(1 + tau * tau))
            t = np.where(safe, t, 0.0)
            cs = 1.0 / np.sqrt(1 + t * t)
            sn = cs * t
            phase = np.where(safe, c / np.maximum(absc, 1e-300), 1.0)  # e^{i phi}
            # columns: u' = cs*u - sn*conj(phase)*v ; v' = sn*phase*u + cs*v
            w1 = sn * np.conj(phase)
            w2 = sn * phase
            for X_L, X_R in ((A_L, A_R), (V_L, V_R)):
                u = X_L.copy()
                X_L[:] = cs[None, :] * u - w1[None, :] * X_R
                X_R[:] = w2[None, :] * u + cs[None, :] * X_R
            A_L, A_R = _rotate_pairing(A_L, A_R)
            V_L, V_R = _rotate_pairing(V_L, V_R)
        if tol and off_max < tol:
            break

    A = np.concatenate([A_L, A_R], axis=1)
    V = np.concatenate([V_L, V_R], axis=1)
    S = np.linalg.norm(A, axis=0)
    order = np.argsort(-S)
    S = S[order]
    A = A[:, order]
    V = V[:, order]
    U = A / np.maximum(S, 1e-300)[None, :]
    return U, S, V.conj().T


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    n = 64

    def check(M, label, sweeps=10):
        U, S, Vh = one_sided_jacobi(M, n_sweeps=sweeps)
        s_ref = np.linalg.svd(M, compute_uv=False)
        rec = np.max(np.abs(U @ np.diag(S) @ Vh - M))
        sv = np.max(np.abs(S - s_ref))
        orth_v = np.max(np.abs(Vh @ Vh.conj().T - np.eye(n)))
        keep = S > 1e-10 * S[0]
        Uk = U[:, keep]
        orth_u = np.max(np.abs(Uk.conj().T @ Uk - np.eye(Uk.shape[1])))
        print(f"{label:28s} sweeps={sweeps:2d} rec={rec:.2e} sval={sv:.2e} "
              f"orthV={orth_v:.2e} orthU={orth_u:.2e}")

    A = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    for sw in (6, 8, 10):
        check(A, "random", sw)
    U0, _ = np.linalg.qr(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    V0, _ = np.linalg.qr(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    s = np.concatenate([np.full(16, 2.0), np.full(16, 1.0),
                        np.geomspace(0.5, 1e-8, 24), np.zeros(8)])
    check(U0 @ np.diag(s) @ V0.conj().T, "degenerate+rankdef", 10)
    s2 = np.geomspace(1.0, 1e-6, n)
    check(U0 @ np.diag(s2) @ V0.conj().T, "geometric", 10)
    r1 = np.outer(rng.normal(size=n), rng.normal(size=n)) + 0j
    check(r1 / np.linalg.norm(r1), "rank-1", 6)
