#!/usr/bin/env python3
"""Probe the axon worker's batched-eigh kernel-fault boundary.

Round-4 finding (2026-08-20): batched gram_eigh at n = 2*chi = 96
(chi_pad=48 two-site panels) kernel-faults the TPU worker at modest
batch sizes -- R=40 realizations x 15 bonds (600 matrices) faults
reliably, R=8 (120 matrices) runs -- where the IDENTICAL program ran in
a round-3 session.  The boundary is therefore worker-version-dependent
and separate from (tighter than) the rows*chi^2 Jacobi envelope
(utils.backend.auto_chunk_rows), which was re-measured intact the same
session (jacobi at 40 rows chi=48 runs, 120 rows faults).

Mitigation shipped: parallel/sweep._resolve_svd_method routes n >= 96
to the Jacobi kernel; n=64 gram_eigh (the phase grid) is measured-good
to batches of 1800.

Re-run this after a worker update to re-map the boundary.  Each probe
runs in a SUBPROCESS so a kernel fault is recorded as a failed probe
instead of killing the sweep; the worker usually self-recovers in
~1 min (the script waits between probes).

Usage:  python baselines/gram_eigh_fault_probe.py
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from timecrystal_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.parallel.sweep import SweepSpec, evolve_batch, _basis_indices

method, chi, R = {method!r}, {chi}, {R}
L, n_periods = 16, 80
tp = TruncParams(chi_max=24, svd_min=1e-12, trunc_cut=1e-7,
                 svd_method=method)
spec = SweepSpec(L=L, chi=chi, n_periods=n_periods, J=1.0,
                 theta=float(np.pi), tp=tp)
np.random.seed(42)
base = np.random.uniform(-1.0, 1.0, L)
h = jnp.asarray(np.linspace(0.1, 0.4, R)[:, None] * base[None, :])
out = evolve_batch(h, jnp.full((R,), 1.0),
                   jnp.asarray(_basis_indices(L, "neel")), spec,
                   thetas=jnp.asarray(np.pi * (1 - np.linspace(0, 0.3, R))))
le = np.asarray(out["loschmidt_echo"])
assert np.isfinite(le).all()
print("OK")
"""


def probe(method: str, chi: int, R: int, timeout: float = 600.0) -> str:
    code = _CHILD.format(repo=_REPO, method=method, chi=chi, R=R)
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return "TIMEOUT"
    if r.returncode == 0 and "OK" in r.stdout:
        return "ok"
    tail = (r.stderr or "")[-400:]
    if "crashed or restarted" in tail or "UNAVAILABLE" in tail:
        return "KERNEL-FAULT"
    return f"fail(rc={r.returncode})"


def main() -> None:
    # (method, chi, rows): the round-4 boundary points plus the
    # measured-good anchors.  rows*bonds = rows*15 matrices per program.
    grid = [
        ("gram_eigh", 32, 120),   # phase-grid class: measured-good
        ("gram_eigh", 48, 8),     # measured-good round 4
        ("gram_eigh", 48, 20),    # faulted round 4
        ("gram_eigh", 48, 40),    # faulted round 4 (ran in round 3)
        ("jacobi", 48, 40),       # measured-good round 4 (~92k envelope)
        ("jacobi", 48, 120),      # faulted round 4 (over the envelope)
    ]
    results = []
    for method, chi, R in grid:
        status = probe(method, chi, R)
        line = f"{method:10s} chi={chi:3d} R={R:3d} ({R * 15:5d} mats): {status}"
        print(line, flush=True)
        results.append(line)
        if status != "ok":
            print("  (waiting 90 s for the worker to self-recover...)",
                  flush=True)
            time.sleep(90)
    print("\nSummary:")
    for line in results:
        print(" ", line)


if __name__ == "__main__":
    main()
