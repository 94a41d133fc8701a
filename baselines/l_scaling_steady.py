"""Chain-length scaling of saturated-chi steady throughput on one TPU chip.

The reference's config.txt contemplates L=128 as "future work"
(/root/reference/config.txt:40) and never runs beyond L=64; its cost model
is O(L) serial TeNPy gate applications per sweep.  Here every same-parity
bond updates in ONE batched kernel, so the per-period cost should scale
sub-linearly in L until the bond batch saturates VMEM bandwidth / MXU
occupancy -- this probe measures the actual scaling at chi=256.

For each L in {40, 80, 128}: settle 40 periods at fixed chi=256 (merged
frame), then time N_TIMED steady periods on the production jacobi_core
path.  Prints per-L steady periods/s, per-bond-update throughput, and the
scaling exponent.  Serializes with the TPU smoke tier via its file lock.

Run on the TPU host:  python baselines/l_scaling_steady.py
"""

import fcntl
import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from timecrystal_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from timecrystal_tpu.core.mps import create_initial_state
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                 make_floquet_gates)

CHI = 256
N_SETTLE = 40
N_TIMED = 10
LS = (40, 80, 128)

_LOCK_PATH = "/tmp/tct_tpu_smoke.lock"   # shared with tests/test_tpu_smoke.py


@contextmanager
def tpu_lock():
    with open(_LOCK_PATH, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def steady_rate(L: int) -> float:
    h_fields = draw_disorder_reference(L, 0.3, 42)
    gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32), 1.0,
                               theta=0.9 * np.pi, dtype=jnp.float32)
    tp = TruncParams(chi_max=0, svd_min=1e-7, svd_method="jacobi_core")
    psi = create_initial_state(L, "neel", chi=CHI, dtype=jnp.float32)
    t0 = time.time()
    psi, _ = evolve_floquet_scan(psi, gates, N_SETTLE, tp, frame="merged")
    np.asarray(psi.lam)            # fetch-fence (block_until_ready is a
    print(f"  L={L}: settled {N_SETTLE} periods in {time.time()-t0:.1f} s "
          "(incl. compile)", flush=True)
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        _, tr = evolve_floquet_scan(psi, gates, N_TIMED, tp, frame="merged")
        np.asarray(tr["loschmidt_echo"])
        best = max(best, N_TIMED / (time.time() - t0))
    return best


def main() -> None:
    rows = []
    with tpu_lock():
        for L in LS:
            pps = steady_rate(L)
            rows.append((L, pps))
            print(f"  L={L}: steady {pps:.3f} periods/s "
                  f"({pps * (L - 1):.0f} bond-updates/s x2 sweeps)",
                  flush=True)
    print("\nL        p/s      bond-updates/s   cost_ratio vs L=40")
    base = rows[0][1]
    for L, pps in rows:
        print(f"{L:<8d} {pps:<8.3f} {pps * (L - 1):<16.0f} "
              f"{base / pps:.2f}x (ideal-linear {(L - 1) / (LS[0] - 1):.2f}x)")
    # scaling exponent from the two endpoints
    a = np.log((rows[0][1]) / rows[-1][1]) / np.log(LS[-1] / LS[0])
    print(f"\nper-period cost ~ L^{a:.2f} (serial reference stack: L^1.0)")


if __name__ == "__main__":
    main()
