"""Reference-equivalent single-core CPU TEBD baseline (denominator).

The reference stack (TeNPy) is not installed in this environment, and the
reference publishes no benchmark numbers (BASELINE.md).  This module
implements the same algorithm class the reference executes -- a serial
Python loop over bonds, one dense complex128 theta build + LAPACK gesdd SVD
+ truncation per bond, adaptive bond dimensions (reference call stack
SURVEY.md section 3.1: TeNPy apply_local_op per bond inside
CustomFloquet.evolve_floquet) -- without TeNPy's np_conserved bookkeeping
overhead.  It is therefore a CONSERVATIVE (faster-than-TeNPy) denominator
for the >=50x north-star target (BASELINE.json).

Usage: python baselines/cpu_tebd.py  -> writes baselines/baseline_cpu.json
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

SX = np.array([[0, 1], [1, 0]], dtype=complex)
SZ = np.array([[1, 0], [0, -1]], dtype=complex)
I2 = np.eye(2, dtype=complex)


class NumpyMPS:
    """Adaptive-bond-dimension MPS in right-canonical (B, lam) form."""

    def __init__(self, L: int, basis_indices):
        self.L = L
        self.B = [np.zeros((1, 2, 1), dtype=complex) for _ in range(L)]
        for i, b in enumerate(basis_indices):
            self.B[i][0, b, 0] = 1.0
        self.lam = [np.ones(1) for _ in range(L + 1)]

    def max_chi(self) -> int:
        return max(b.shape[0] for b in self.B)


def apply_two_site(psi: NumpyMPS, b: int, gate: np.ndarray,
                   chi_max: int, svd_min: float) -> None:
    """One bond update: theta -> gesdd SVD -> truncate (Hastings form)."""
    Bl, Br = psi.B[b], psi.B[b + 1]
    cl, _, cm = Bl.shape
    _, _, cr = Br.shape
    theta_t = np.tensordot(Bl, Br, axes=(2, 0))            # [cl,2,2,cr]
    theta_t = np.einsum("pqrs,arsc->apqc", gate.reshape(2, 2, 2, 2), theta_t)
    theta = psi.lam[b][:, None, None, None] * theta_t
    M = theta.reshape(cl * 2, 2 * cr)
    U, S, Vh = np.linalg.svd(M, full_matrices=False)       # LAPACK gesdd
    keep = min(chi_max, int(np.sum(S > svd_min)))
    keep = max(keep, 1)
    S_k = S[:keep]
    nrm = np.linalg.norm(S_k)
    S_k = S_k / nrm
    Vh_k = Vh[:keep]
    psi.B[b + 1] = Vh_k.reshape(keep, 2, cr)
    Bl_new = theta_t.reshape(cl * 2, 2 * cr) @ Vh_k.conj().T / nrm
    psi.B[b] = Bl_new.reshape(cl, 2, keep)
    psi.lam[b + 1] = S_k


def build_gates(L, J, h_fields, tau, theta):
    import scipy.linalg

    gates = []
    for i in range(L - 1):
        H = (J * np.kron(SZ, SZ) + h_fields[i] * np.kron(SZ, I2)
             + h_fields[i + 1] * np.kron(I2, SZ))
        gates.append(scipy.linalg.expm(-1j * tau / 2 * H))
    kick = scipy.linalg.expm(-1j * theta / 2 * SX)
    return gates, kick


def floquet_period(psi: NumpyMPS, gates, kick, chi_max, svd_min):
    """Even bonds, odd bonds, kick every site, even, odd -- the reference's
    exact sequence (kicked_ising.py:100-148), serial per bond."""
    for start in (0, 1):
        for b in range(start, psi.L - 1, 2):
            apply_two_site(psi, b, gates[b], chi_max, svd_min)
    for i in range(psi.L):
        psi.B[i] = np.einsum("pq,aqc->apc", kick, psi.B[i])
    for start in (0, 1):
        for b in range(start, psi.L - 1, 2):
            apply_two_site(psi, b, gates[b], chi_max, svd_min)
    return psi


def measure(L=40, chi_max=256, theta_frac=0.9, h=0.3, tau=1.0, seed=42,
            n_periods=30, tail=5, verbose=True):
    np.random.seed(seed)
    h_fields = np.random.uniform(-h, h, L)
    gates, kick = build_gates(L, 1.0, h_fields, tau, theta_frac * np.pi)
    psi = NumpyMPS(L, [i % 2 for i in range(L)])
    per_period = []
    for p in range(n_periods):
        t0 = time.time()
        floquet_period(psi, gates, kick, chi_max, 1e-12)
        per_period.append(time.time() - t0)
        if verbose:
            print(f"period {p+1:3d}: {per_period[-1]*1e3:9.1f} ms, "
                  f"chi={psi.max_chi()}", flush=True)
    tail_mean = float(np.mean(per_period[-tail:]))
    return {
        "periods_per_second_tail": 1.0 / tail_mean,
        "seconds_per_period_tail": tail_mean,
        "final_chi": psi.max_chi(),
        "per_period_seconds": per_period,
        "config": dict(L=L, chi_max=chi_max, theta_frac=theta_frac, h=h,
                       tau=tau, seed=seed, n_periods=n_periods),
        "provenance": "single-core NumPy/LAPACK TEBD, reference-equivalent "
                      "algorithm (serial per-bond gesdd); TeNPy unavailable "
                      "in image, this is a conservative (faster) stand-in",
    }


if __name__ == "__main__":
    out_path = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    results = {}
    # headline: L=40 chi=256 entangling regime (BASELINE.json north star)
    results["L40_chi256_theta0.9pi"] = measure(L=40, chi_max=256,
                                               theta_frac=0.9, n_periods=30)
    # figure-parity mode: exact pi pulse (rank-1 dynamics, overhead-bound)
    results["L64_figureA_thetapi"] = measure(L=64, chi_max=256,
                                             theta_frac=1.0, h=0.25,
                                             tau=2.0, n_periods=50, tail=10)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v["periods_per_second_tail"] for k, v in results.items()},
                     indent=2))
    print(f"wrote {out_path}")
