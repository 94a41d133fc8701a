"""Exact dense-statevector implementation of the reference semantics.

Independent oracle for parity tests: builds the *same* Floquet unitary the
reference builds (including the field double-counting quirk, reference
src/models/kicked_ising.py:73-148 / SURVEY.md quirks 2-4) as a dense 2^L
matrix with NumPy, with no MPS/truncation involved.  Usable up to L ~ 12.
"""

from __future__ import annotations

import numpy as np

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)
I2 = np.eye(2, dtype=complex)


def _kron_at(op: np.ndarray, sites: list[int], L: int) -> np.ndarray:
    """Operator acting as `op` on consecutive `sites`, identity elsewhere."""
    mats = []
    i = 0
    while i < L:
        if i == sites[0]:
            mats.append(op)
            i += len(sites)
        else:
            mats.append(I2)
            i += 1
    out = mats[0]
    for m in mats[1:]:
        out = np.kron(out, m)
    return out


def floquet_unitary(L: int, J: float, h_fields: np.ndarray, tau: float,
                    theta: float = np.pi) -> np.ndarray:
    """Dense U_F with the reference's exact gate ordering.

    Half-step: even bonds (0,2,...), then odd bonds, each gate
    exp(-i tau/2 (J ZZ + h_i Z I + h_j I Z)) with FULL fields (double
    counting on interior sites); pi-pulse -i X per site; half-step again.
    All bond gates commute (diagonal) so ordering within a half-step is
    irrelevant, but we keep it anyway.
    """
    import scipy.linalg

    def bond_gate(i):
        H = (J * np.kron(SZ, SZ) + h_fields[i] * np.kron(SZ, I2)
             + h_fields[i + 1] * np.kron(I2, SZ))
        return scipy.linalg.expm(-1j * tau / 2 * H)

    half = np.eye(2**L, dtype=complex)
    for start in (0, 1):
        for b in range(start, L - 1, 2):
            half = _kron_at(bond_gate(b), [b, b + 1], L) @ half

    kick = np.eye(2**L, dtype=complex)
    pulse = scipy.linalg.expm(-1j * theta / 2 * SX)
    for s in range(L):
        kick = _kron_at(pulse, [s], L) @ kick

    return half @ kick @ half


def product_statevector(basis_indices) -> np.ndarray:
    """|i_0 i_1 ... >: index 0 == up == sigma_z +1."""
    v = np.array([1.0], dtype=complex)
    for b in basis_indices:
        e = np.zeros(2, dtype=complex)
        e[b] = 1.0
        v = np.kron(v, e)
    return v


def neel_indices(L: int) -> np.ndarray:
    return np.array([0 if i % 2 == 0 else 1 for i in range(L)])


def sz_expectations(psi: np.ndarray, L: int) -> np.ndarray:
    """<sigma_z_i> for all sites from a dense statevector."""
    p = np.abs(psi.reshape([2] * L)) ** 2
    out = np.zeros(L)
    for i in range(L):
        axes = tuple(a for a in range(L) if a != i)
        marg = p.sum(axis=axes)
        out[i] = marg[0] - marg[1]
    return out


def long_range_floquet_unitary(L: int, couplings_r: np.ndarray,
                               h_fields: np.ndarray, tau: float,
                               theta: float = np.pi) -> np.ndarray:
    """Dense U_F for the LONG-RANGE kicked Ising (clean semantics, no
    double-counting quirk): H_z = sum_r couplings_r[r-1] sum_i z_i z_{i+r}
    + sum_i h_i z_i is diagonal, so the half-step is a diagonal phase.

    ``couplings_r``: J(r) for r = 1..L-1 -- pass the exponential-sum
    FITTED table (models.long_range.fitted_couplings) to isolate the
    TDVP integrator error from the fit error.
    """
    import scipy.linalg

    idx = np.arange(2 ** L)
    # bit b of the index = site b (big-endian kron order); 0 == up == +1
    s = 1.0 - 2.0 * ((idx[:, None] >> np.arange(L - 1, -1, -1)[None, :]) & 1)
    E = s @ np.asarray(h_fields, dtype=np.float64)
    for r in range(1, L):
        Jr = float(couplings_r[r - 1])
        if Jr != 0.0:
            E = E + Jr * np.sum(s[:, :-r] * s[:, r:], axis=1)
    half = np.exp(-1j * tau / 2 * E)          # diagonal phases
    pulse = scipy.linalg.expm(-1j * theta / 2 * SX)
    kick = np.eye(1, dtype=complex)
    for _ in range(L):
        kick = np.kron(kick, pulse)
    return half[:, None] * (kick * half[None, :])


def evolve_exact(L: int, J: float, h_fields: np.ndarray, tau: float,
                 n_periods: int, basis_indices=None, theta: float = np.pi,
                 backend: str = "auto"):
    """Evolve and record (sz_sites [n+1, L], loschmidt [n+1]).

    backend 'auto' uses the native C++ statevector oracle
    (timecrystal_tpu/native) when it builds, falling back to the dense
    NumPy unitary; both implement the reference's exact gate semantics.
    """
    if basis_indices is None:
        basis_indices = neel_indices(L)
    psi0 = product_statevector(basis_indices)

    native = None
    if backend in ("auto", "native"):
        try:
            from timecrystal_tpu import native as native_mod
            if native_mod.available():
                native = native_mod
        except Exception:
            native = None
        if backend == "native" and native is None:
            raise RuntimeError("native oracle unavailable")

    sz = [sz_expectations(psi0, L)]
    le = [1.0]
    psi = psi0.copy()
    if native is not None:
        for _ in range(n_periods):
            psi = native.ki_evolve_exact(psi, L, J, h_fields, tau, theta, 1)
            sz.append(native.ki_sz_sites(psi, L))
            le.append(abs(np.vdot(psi0, psi)) ** 2)
        return np.array(sz), np.array(le)

    U = floquet_unitary(L, J, h_fields, tau, theta=theta)
    for _ in range(n_periods):
        psi = U @ psi
        sz.append(sz_expectations(psi, L))
        le.append(abs(np.vdot(psi0, psi)) ** 2)
    return np.array(sz), np.array(le)
