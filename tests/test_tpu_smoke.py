"""On-TPU smoke tier: the COMPILED (non-interpret) kernel paths.

The main suite forces the CPU backend (tests/conftest.py) for float64
parity gates and the virtual 8-device mesh, so the TPU-default code paths
-- the compiled Pallas Jacobi kernel, the gram_eigh auto selection, the f32
precision='highest' end-to-end error -- would otherwise only be exercised
by bench.py and manual runs.  These tests spawn fresh subprocesses that
initialize the default (TPU) platform and assert on JSON results printed
by the child.  Skipped automatically when no TPU-like backend is attached.

Thresholds come from measured behavior on the axon TPU v5e (see
PERFORMANCE.md): per-SVD S error ~1e-5 relative at the adaptive-exit
default, end-to-end trace error ~1e-5 class over tens of periods.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Error signatures of a wedged/restarting axon TPU worker (observed in
# round-2 flakes: one child timed out, the NEXT got FailedPrecondition
# from the worker the first one left wedged).  Only these retry.
_BACKEND_FAILURE_MARKS = ("FailedPrecondition", "DEADLINE_EXCEEDED",
                          "UNAVAILABLE", "Socket closed",
                          "failed to connect", "Connection reset",
                          "INTERNAL: Accelerator device halted")

_LOCK_PATH = "/tmp/tct_tpu_smoke.lock"


@contextlib.contextmanager
def _tpu_lock():
    """Serialize TPU children across processes: a wedged worker cascades
    into whatever grabs the tunnel next, so children must never overlap
    (round-2 VERDICT weak #3)."""
    with open(_LOCK_PATH, "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def _run_child(code: str, timeout: int = 1100, env_extra: dict | None = None,
               retries: int = 1):
    # timeout: the heavier children take ~4-6 min warm-cache but can reach
    # ~9 min when another process holds the TPU (the tunnel serializes);
    # 560 s produced flaky suite-level timeouts under contention.
    """Run `code` in a fresh interpreter using the DEFAULT jax platform
    (no forced CPU); returns the last JSON line of stdout.

    Children are serialized via a file lock, and a run that dies with a
    backend-failure signature (wedged axon worker) or times out is retried
    ONCE in a fresh process after a cooldown -- same policy as
    bench._main_with_retry.  Genuine assertion/numerics failures (clean
    nonzero exit without a backend mark) do NOT retry."""
    env = dict(os.environ)
    # do not inherit the test session's CPU forcing, if any
    env.pop("XLA_FLAGS", None)
    if env_extra:
        env.update(env_extra)

    def attempt():
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, cwd=REPO,
                              env=env, timeout=timeout)

    with _tpu_lock():
        try:
            proc = attempt()
            retry = (proc.returncode != 0
                     and any(m in (proc.stderr or "") + (proc.stdout or "")
                             for m in _BACKEND_FAILURE_MARKS))
        except subprocess.TimeoutExpired:
            proc, retry = None, True
        if retry and retries <= 0:
            raise RuntimeError("child hit a backend failure (no retries)")
        if retry:
            time.sleep(60)      # let the worker restart
            proc = attempt()
    assert proc.returncode == 0, (
        f"child failed rc={proc.returncode}\nstdout:{proc.stdout[-2000:]}"
        f"\nstderr:{proc.stderr[-3000:]}")
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, f"no JSON line in child stdout: {proc.stdout[-2000:]}"
    return json.loads(lines[-1])


def _tpu_platform() -> str:
    # retries=0: this runs at COLLECTION time, and retrying a wedged-worker
    # probe stalls every suite invocation ~5 min for the same answer
    out = _run_child(
        "import json, jax; "
        "print(json.dumps({'p': jax.devices()[0].platform}))", timeout=120,
        retries=0)
    return out["p"].lower()


try:
    _PLATFORM = _tpu_platform()
except Exception:
    _PLATFORM = "none"

tpu_only = pytest.mark.skipif(
    _PLATFORM not in ("tpu", "axon"),
    reason=f"no TPU-like backend attached (platform={_PLATFORM})")


@tpu_only
def test_compiled_jacobi_sv_vs_lapack():
    """Compiled (non-interpret) V-free Jacobi kernel on TEBD-shaped
    512x512 thetas with a decaying spectrum: S matches LAPACK, kept V
    columns are orthonormal-or-zero after the NS polish."""
    out = _run_child("""
import json, numpy as np, jax.numpy as jnp
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_sv
rng = np.random.RandomState(7)
B, n, k = 4, 512, 256
M = np.zeros((B, n, n), np.complex64)
for i in range(B):
    q1, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
    q2, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
    M[i] = (q1 * np.logspace(0, -7, n)) @ q2.conj().T
th = C(jnp.asarray(M.real), jnp.asarray(M.imag))
S, V = jacobi_sv(th, polish=k)
S = np.asarray(S)
Sref = np.linalg.svd(M, compute_uv=False)
serr = float(np.max(np.abs(S - Sref)) / Sref.max())
Vk = np.asarray(V.re)[..., :k] + 1j * np.asarray(V.im)[..., :k]
G = np.einsum("bji,bjk->bik", Vk.conj(), Vk)
dg = np.einsum("bii->bi", G).real
diag_ok = bool(np.allclose(dg, np.round(dg), atol=1e-4))
off = G - np.einsum("bi,ij->bij", np.einsum("bii->bi", G), np.eye(k))
print(json.dumps({"serr": serr, "diag_ok": diag_ok,
                  "offmax": float(np.abs(off).max())}))
""")
    assert out["serr"] < 5e-5, out
    assert out["diag_ok"], out
    assert out["offmax"] < 5e-5, out


@tpu_only
def test_compiled_jacobi_proj_vs_lapack():
    """Compiled chained projected SVD (jacobi_proj, the steady-state bench
    path) on TEBD-shaped 512x512 thetas with a steep spectrum: top-chi S
    matches LAPACK at the measured error class (boundary-concentrated,
    PERFORMANCE.md), V kept columns orthonormal, disc conservative."""
    out = _run_child("""
import json, numpy as np, jax.numpy as jnp
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_proj
rng = np.random.RandomState(11)
B, n, k = 4, 512, 256
M = np.zeros((B, n, n), np.complex64)
for i in range(B):
    q1, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
    q2, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
    M[i] = (q1 * np.logspace(0, -7, n)) @ q2.conj().T
th = C(jnp.asarray(M.real), jnp.asarray(M.imag))
S, V, disc = jacobi_proj(th, k, polish=k, polish_b_iters=6, polish_iters=6)
S = np.asarray(S)
Sref = np.linalg.svd(M, compute_uv=False)
serr = float(np.max(np.abs(S - Sref[:, :k])) / Sref.max())
Vk = np.asarray(V.re) + 1j * np.asarray(V.im)
G = np.einsum("bji,bjk->bik", Vk.conj(), Vk)
offmax = float(np.abs(G - np.eye(k)[None]).max())
d_true = np.sum(Sref[:, k:] ** 2, axis=1)
norm2 = np.sum(Sref ** 2, axis=1)
# disc = |theta|_F^2 - sum S^2 in f32: conservative up to the f32
# Frobenius-reduction noise floor (~eps*sqrt(numel)*norm2 ~ 3e-5*norm2
# at n=512) -- the leak adds, the reduction noise is two-sided
cons = bool(np.all(np.asarray(disc) >= d_true - 1e-4 * norm2))
print(json.dumps({"serr": serr, "offmax": offmax, "disc_conservative": cons}))
""")
    assert out["serr"] < 5e-4, out
    assert out["offmax"] < 5e-5, out
    assert out["disc_conservative"], out


@tpu_only
def test_compiled_jacobi_core_vs_lapack():
    """Compiled core-matrix projected SVD (jacobi_core, the steady-state
    bench path): top-chi S at the measured error class, V kept columns
    orthonormal, disc conservative -- same contract as jacobi_proj (they
    share the fixed-basis one-power capture), ~2x faster per call
    (baselines/polar_core_experiment.py)."""
    out = _run_child("""
import json, numpy as np, jax.numpy as jnp
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_core
rng = np.random.RandomState(11)
B, n, k = 4, 512, 256
M = np.zeros((B, n, n), np.complex64)
for i in range(B):
    q1, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
    q2, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
    M[i] = (q1 * np.logspace(0, -7, n)) @ q2.conj().T
th = C(jnp.asarray(M.real), jnp.asarray(M.imag))
S, V, disc = jacobi_core(th, k)
S = np.asarray(S)
Sref = np.linalg.svd(M, compute_uv=False)
serr = float(np.max(np.abs(S - Sref[:, :k])) / Sref.max())
Vk = np.asarray(V.re) + 1j * np.asarray(V.im)
G = np.einsum("bji,bjk->bik", Vk.conj(), Vk)
offmax = float(np.abs(G - np.eye(k)[None]).max())
d_true = np.sum(Sref[:, k:] ** 2, axis=1)
norm2 = np.sum(Sref ** 2, axis=1)
cons = bool(np.all(np.asarray(disc) >= d_true - 1e-4 * norm2))
print(json.dumps({"serr": serr, "offmax": offmax, "disc_conservative": cons}))
""")
    assert out["serr"] < 5e-4, out
    assert out["offmax"] < 5e-5, out
    assert out["disc_conservative"], out


@tpu_only
def test_compiled_jacobi_core_fast_cert_bound():
    """The bench certificate config: csvd_topk(method='jacobi_core_fast').
    bench.py emits cert = max trunc_err + (L-1) * CERT_SLACK_PER_BOND as
    a per-period discarded-weight bound; its soundness rests on the
    KEPT-WEIGHT OVERSHOOT (sum S^2 - true top-k weight, the amount by
    which reported disc can under-report) staying below the slack
    constant.  Pinned here on the compiled kernel at <= 5e-5 per
    unit-norm bond across a steep steady-class spectrum AND a
    rank-deficient one (bench's CERT_SLACK_PER_BOND = 1e-4 keeps 2x
    margin; full measurement: baselines/cert_slack_experiment.py)."""
    out = _run_child("""
import json, numpy as np, jax.numpy as jnp
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.csvd import csvd_topk
rng = np.random.RandomState(11)
B, n, k = 4, 512, 256
res = {}
for tag, spec in (("steep", np.logspace(0, -7, n)),
                  ("rankdef", np.concatenate([np.linspace(1, 0.01, 128),
                                              np.zeros(n - 128)]))):
    M = np.zeros((B, n, n), np.complex64)
    for i in range(B):
        q1, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
        q2, _ = np.linalg.qr(rng.randn(n, n) + 1j * rng.randn(n, n))
        s = spec / max(np.linalg.norm(spec), 1e-30)   # unit Frobenius
        M[i] = (q1 * s) @ q2.conj().T
    th = C(jnp.asarray(M.real), jnp.asarray(M.imag))
    S, Vh, disc = csvd_topk(th, k, method="jacobi_core_fast")
    S = np.asarray(S, np.float64)
    Sref = np.linalg.svd(M, compute_uv=False).astype(np.float64)
    res[tag + "_serr"] = float(np.max(np.abs(S - Sref[:, :k])) / Sref.max())
    res[tag + "_overshoot"] = float(
        np.max(np.sum(S ** 2, axis=1) - np.sum(Sref[:, :k] ** 2, axis=1)))
print(json.dumps(res))
""")
    assert out["steep_serr"] < 1e-3, out
    assert out["steep_overshoot"] < 5e-5, out
    assert out["rankdef_overshoot"] < 5e-5, out


@tpu_only
def test_compiled_small_n_svd_paths():
    """csvd_topk small-n routing on TPU: 'auto' at n=128/batch 6 routes to
    the Jacobi kernel (small batch -> kernel beats the backend's flat-cost
    eigh); the explicit 'gram_eigh' large-batch path stays correct.  Both
    compiled, both checked against LAPACK."""
    out = _run_child("""
import json, numpy as np, jax.numpy as jnp
from timecrystal_tpu.ops.cpx import C
from timecrystal_tpu.ops.csvd import csvd_topk
rng = np.random.RandomState(3)
B, n, k = 6, 128, 64
M = (rng.randn(B, n, n) + 1j * rng.randn(B, n, n)).astype(np.complex64)
M /= np.sqrt(n)
th = C(jnp.asarray(M.real), jnp.asarray(M.imag))
Sref = np.linalg.svd(M, compute_uv=False)[:, :k]
res = {}
for meth in ("auto", "gram_eigh"):
    S, Vh, disc = csvd_topk(th, k, method=meth)
    res[meth] = float(np.max(np.abs(np.asarray(S) - Sref)) / Sref.max())
print(json.dumps(res))
""")
    assert out["auto"] < 2e-4, out
    assert out["gram_eigh"] < 2e-4, out


@tpu_only
def test_f32_end_to_end_trace_error_vs_oracle():
    """Full-rank L=12 evolution on the TPU f32 pipeline vs the exact dense
    oracle, both frames; merged frame must match strict to f32 accuracy."""
    out = _run_child("""
import json, sys, numpy as np, jax.numpy as jnp
sys.path.insert(0, "tests")
from exact_reference import evolve_exact
from timecrystal_tpu.core.mps import create_initial_state
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                 make_floquet_gates)
L, chi, n_per, theta = 12, 128, 25, 0.92 * np.pi
hf = draw_disorder_reference(L, 0.3, 42)
gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float32), 1.0,
                           theta=theta, dtype=jnp.float32)
psi0 = create_initial_state(L, "neel", chi=chi, dtype=jnp.float32)
sz_ex, le_ex = evolve_exact(L, 1.0, hf, 1.0, n_per, theta=theta)
res = {}
for frame in ("strict", "merged"):
    tp = TruncParams(chi_max=0, svd_min=1e-7)
    _, tr = evolve_floquet_scan(psi0, gates, n_per, tp, frame=frame)
    sz = np.asarray(tr["sz_sites"]); le = np.asarray(tr["loschmidt_echo"])
    res[frame + "_sz"] = float(np.max(np.abs(sz - sz_ex[1:])))
    res[frame + "_le"] = float(np.max(np.abs(le - le_ex[1:])))
print(json.dumps(res))
""")
    assert out["strict_sz"] < 1e-4, out
    assert out["strict_le"] < 1e-4, out
    assert out["merged_sz"] < 1e-4, out
    assert out["merged_le"] < 1e-4, out


@tpu_only
def test_staged_window_matches_fixed_chi_f32():
    """The headline bench path (chi-staged vmapped ensemble, merged frame,
    Jacobi kernel) reproduces fixed-full-chi strict-frame observables on
    the compiled f32 pipeline: staging escalations and the half-step frame
    must both be numerically invisible at the f32 error floor."""
    out = _run_child("""
import json, numpy as np, jax, jax.numpy as jnp
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.models.kicked_ising import draw_disorder_batch
from timecrystal_tpu.parallel.sweep import (SweepSpec, _basis_indices,
                                            evolve_batch, evolve_batch_auto)
# n=24 periods so the Schmidt rank (16 at period ~11, 63 by period 24 at
# svd_min=1e-7) outgrows the chi>=16 device-backend floor applied by
# evolve_batch_auto (sweep.py: gram_eigh guard) -- 12 periods stopped
# exercising staging once that floor landed (rank never left chi_pad=16).
L, chi, n, R = 16, 64, 24, 2
tp = TruncParams(chi_max=0, svd_min=1e-7)
spec = SweepSpec(L=L, chi=chi, n_periods=n, theta=0.9 * float(np.pi),
                 tp=tp, dtype="float32", frame="merged")
h = draw_disorder_batch(jax.random.PRNGKey(3), R, L, 0.3)
taus = jnp.full((R,), 1.0)
basis = jnp.asarray(_basis_indices(L, "neel"))
tr, info = evolve_batch_auto(h, taus, basis, spec, chi_start=8,
                             chunk_periods=4, growth=1.5)
ref = evolve_batch(h, taus, basis, spec._replace(frame="strict"))
d_sz = float(np.max(np.abs(tr["sz_sites"] - np.asarray(ref["sz_sites"]))))
d_le = float(np.max(np.abs(tr["loschmidt_echo"]
                           - np.asarray(ref["loschmidt_echo"]))))
print(json.dumps({"d_sz": d_sz, "d_le": d_le,
                  "chi_pad": info["chi_pad_used"],
                  "n_esc": len(info["chi_escalations"])}))
""")
    assert out["n_esc"] >= 1, out          # staging actually exercised
    assert out["d_sz"] < 5e-4, out
    assert out["d_le"] < 5e-4, out


@tpu_only
def test_bench_contract_quick():
    """bench.py prints one JSON line with the required keys (tiny shapes
    via TCT_BENCH_QUICK; same code path as the driver's benchmark run)."""
    out = _run_child(
        "import runpy; runpy.run_path('bench.py', run_name='__main__')",
        env_extra={"TCT_BENCH_QUICK": "1"})
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, out
    assert out["value"] > 0, out
