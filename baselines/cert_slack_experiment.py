"""Certificate slack measurement for the projected steady-SVD path.

bench.py emits ``steady_cert_err_per_period``: a machine-checked upper
bound on the squared Schmidt weight the projected steady path discards
per period.  The raw reported trunc_err is NOT sound alone: the
``jacobi_core_fast`` kept singular values can OVERSHOOT the true top-k
(polish orthonormality defects + f32 Frobenius reduction noise), so
``disc = ||theta||_F^2 - sum S^2`` under-reports -- at steady state the
true tail is so small that every bond clamps disc to exactly 0.0
(observed on the round-5 bench: raw cert 0.0).

The sound bound adds the kept-weight overshoot ceiling per bond:

    cert = max_period(reported trunc_err)
           + n_bond_updates_per_period * CERT_SLACK_PER_BOND

with CERT_SLACK_PER_BOND an empirical constant pinned by measurement
and by the TPU smoke tier.

Measured on the axon TPU (compiled kernel, 2026-08-20, this file's
recipe: [8, 512, 512] unit-Frobenius batches, k = 256, f64 host
accumulation of sum S^2 - sum Sref[:k]^2):

    steep logspace(0,-7):        max overshoot  1.05e-5
    steady-like (flat + 1e-5 tail): max overshoot -2.10e-4 (conservative)
    dense boundary logspace(0,-3):  max overshoot -5.57e-3 (conservative)
    rank-deficient (rank 128):   max overshoot  2.09e-5

Worst observed: 2.1e-5 per unit-norm bond.  The smoke tier asserts
<= 5e-5 on the adversarial classes
(tests/test_tpu_smoke.py::test_compiled_jacobi_core_fast_cert_bound);
bench.py uses 1e-4 (2x the asserted ceiling, ~5x the worst measurement).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from timecrystal_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.csvd import csvd_topk

rng = np.random.RandomState(11)
B, n, k = 8, 512, 256
CLASSES = (
    ("steep logspace(0,-7)", lambda: np.logspace(0, -7, n)),
    ("steady-like (flat + 1e-5 tail)",
     lambda: np.concatenate([np.linspace(1, 0.01, k), np.full(n - k, 1e-5)])),
    ("dense boundary logspace(0,-3)", lambda: np.logspace(0, -3, n)),
    ("rank-deficient (rank 128)",
     lambda: np.concatenate([np.linspace(1, 0.01, 128), np.zeros(n - 128)])),
)

for tag, spec_fn in CLASSES:
    M = np.zeros((B, n, n), np.complex64)
    for i in range(B):
        q1, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
        q2, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
        s = spec_fn()
        s = s / max(np.linalg.norm(s), 1e-30)      # unit Frobenius norm
        M[i] = (q1 * s) @ q2.conj().T
    th = C(jnp.asarray(M.real), jnp.asarray(M.imag))
    S, Vh, disc = csvd_topk(th, k, method="jacobi_core_fast")
    S = np.asarray(S, np.float64)
    Sref = np.linalg.svd(M, compute_uv=False).astype(np.float64)
    overshoot = np.sum(S ** 2, axis=1) - np.sum(Sref[:, :k] ** 2, axis=1)
    print(f"{tag}: max kept-weight overshoot = {overshoot.max():.3e}")
