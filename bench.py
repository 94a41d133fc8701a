#!/usr/bin/env python3
"""Headline benchmark (BASELINE.json): Floquet throughput at L=40, chi=256.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Two regimes of the same workload (L=40 chi=256 entangling, theta=0.9pi),
both measured, both compared window-matched against the recorded
single-core CPU TEBD (baselines/cpu_tebd.py -- reference-equivalent
serial NumPy/LAPACK TEBD with DYNAMIC per-bond rank, like TeNPy):

  * headline "ensemble window": the production workload -- R=16 disorder
    realizations, 20 periods each from the Neel state, evolved as ONE
    chi-staged vmapped program (parallel/sweep.evolve_batch_auto: padded
    chi 32 -> 48 -> 72 -> ... (x1.5 ladder), shared schedule, escalate on
    real truncation --
    observables identical to fixed-chi evolution).  The theta rank stays
    < 64 for ~20 periods (baselines/proj_leak_profile.py); the CPU stack
    exploits that via dynamic per-bond shapes, we via the staging, and
    the low-chi stages batch nearly for free on the chip.  Aggregate
    chain-periods/s, divided by the CPU's own first-20-period
    per-chain throughput (chip vs core).
  * extra "steady": saturated-chi throughput (10 periods started from
    the period-40 state, chi pinned at 256) vs the CPU's steady tail --
    the sustained-cost comparison with no transient in either number.
    (At true steady state vmapped batching adds nothing -- the Jacobi
    kernel saturates VMEM bandwidth with one chain, measured R=2
    aggregate == single -- so steady is reported single-chain.)

The ENTANGLING regime (theta = 0.9 pi) is used so chi genuinely grows and
every bond update pays a real SVD -- with the reference's exact-pi-pulse
figure configs the dynamics stays rank-1 and both stacks would only
measure bookkeeping overhead.

TeNPy itself is not installed in this image; the recorded stand-in is
faster than TeNPy, so the reported ratios are conservative.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

CONFIG = dict(L=40, chi=256, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
N_WINDOW = 20           # the benchmark window (periods from t=0)
N_STEADY = 10           # timed steady-state periods (from period 40)
N_SETTLE = 40           # periods evolved (staged) to reach saturation
ENSEMBLE_R = 16         # disorder realizations in the headline batch
CHI_START = 32
CHUNK = 5
if os.environ.get("TCT_BENCH_QUICK"):
    # contract smoke mode (tests/test_tpu_smoke.py): tiny shapes, same
    # code path and output format
    CONFIG = dict(L=12, chi=32, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
    N_WINDOW = 5
    N_STEADY = 3
    N_SETTLE = 5
    ENSEMBLE_R = 2
    CHI_START = 16
    CHUNK = 5
# per-bond kept-weight-overshoot ceiling of the jacobi_core_fast path
# (see run_steady docstring; measured + smoke-tier-pinned)
CERT_SLACK_PER_BOND = 1e-4
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baselines", "baseline_cpu.json")
# steady-state denominator (60-period run, tail=10; per-period series used
# for the window-matched transient denominator)
BASELINE_KEY = "L40_chi256_theta0.9pi_steady"


def run_ensemble_window(R: int, n_periods: int) -> float:
    """Chi-staged vmapped ensemble: R disorder realizations, n periods from
    t=0, one shared chi schedule.  Returns aggregate chain-periods/s."""
    import jax
    import jax.numpy as jnp

    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.models.kicked_ising import draw_disorder_batch
    from timecrystal_tpu.parallel.sweep import (SweepSpec, _basis_indices,
                                                evolve_batch_auto)

    cfg = CONFIG
    spec = SweepSpec(L=cfg["L"], chi=cfg["chi"], n_periods=n_periods,
                     theta=cfg["theta_frac"] * float(np.pi),
                     tp=TruncParams(chi_max=0, svd_min=1e-7),
                     dtype="float32", frame="merged")
    h = draw_disorder_batch(jax.random.PRNGKey(cfg["seed"]), R, cfg["L"],
                            cfg["h"])
    taus = jnp.full((R,), cfg["tau"])
    basis = jnp.asarray(_basis_indices(cfg["L"], "neel"))

    def once() -> float:
        t0 = time.time()
        evolve_batch_auto(h, taus, basis, spec, chi_start=CHI_START,
                          chunk_periods=CHUNK, growth=1.5)
        return R * n_periods / (time.time() - t0)

    once()                         # warmup: compiles every stage program
    return max(once() for _ in range(3))


def _steady_state():
    """Evolve to period N_SETTLE at fixed full chi (merged frame) so the
    steady metric times a saturated chi=256 chain; returns (psi, gates, tp).
    The settle cost is not part of the measured window, so fixed-chi is
    fine here (staging would only speed the unmeasured transient)."""
    import jax.numpy as jnp

    from timecrystal_tpu.core.mps import create_initial_state
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan
    from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                     make_floquet_gates)

    cfg = CONFIG
    h_fields = draw_disorder_reference(cfg["L"], cfg["h"], cfg["seed"])
    gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32),
                               cfg["tau"], theta=cfg["theta_frac"] * np.pi,
                               dtype=jnp.float32)
    tp = TruncParams(chi_max=0, svd_min=1e-7)
    psi = create_initial_state(cfg["L"], "neel", chi=cfg["chi"],
                               dtype=jnp.float32)
    psi, _ = evolve_floquet_scan(psi, gates, N_SETTLE, tp, frame="merged")
    return psi, gates, tp


def _time_steady(psi, gates, tp, n_periods: int):
    """Best-of-3 steady throughput of evolve_floquet_scan from the settled
    state, plus the last run's per-period trunc_err trace (identical
    across repetitions: same start state, same program)."""
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan

    _, tr = evolve_floquet_scan(psi, gates, n_periods, tp, frame="merged")
    np.asarray(tr["loschmidt_echo"])         # sync (block_until_ready is a
    best = 0.0                               # no-op through the axon tunnel)
    for _ in range(3):
        t0 = time.time()
        _, tr = evolve_floquet_scan(psi, gates, n_periods, tp,
                                    frame="merged")
        np.asarray(tr["loschmidt_echo"])
        best = max(best, n_periods / (time.time() - t0))
    return best, np.asarray(tr["trunc_err"])


def run_steady(psi, gates, tp, n_periods: int):
    """Saturated-chi throughput on the core-matrix projected-SVD path
    (svd_method='jacobi_core_fast', ops/pallas/jacobi_svd.jacobi_core
    with the single-pass-bf16 quintic polar stage): at steady state the
    rank fills the padded chi; both subspace bases come from polynomial
    polar (MXU matmuls) and the only rotation kernel runs on the k x k
    core -- measured ~15 p/s vs jacobi_proj's 5.4 and the full kernel's
    2.4 at L=40 chi=256, with closed-loop staggered/LE deltas vs the
    full-kernel path of 4.7e-4 / 1.5e-3 over 50 periods
    (baselines/jacobi_core_closedloop.py and PERFORMANCE.md round 3).
    The _fast variant is the right call HERE because the measured
    workload is exactly the spectrum class it is gated on (saturated
    steep TEBD thetas); the input-agnostic default 'jacobi_core' keeps
    full quintic precision.

    Returns (periods/s, cert_err): cert_err is the MACHINE-CHECKED
    accuracy certificate for the projected path -- an upper bound on the
    squared Schmidt weight discarded in any single period of the timed
    window:

        cert = max_period(reported trunc_err)
               + n_bond_updates_per_period * CERT_SLACK_PER_BOND

    The reported disc alone is variational ONLY up to the kept-weight
    overshoot of the fast polish (f32 Frobenius noise + orthonormality
    defects let sum S^2 exceed the true top-k weight, clamping disc to
    0.0 at steady state); the slack term covers that overshoot with a
    measured ceiling: worst observed 2.1e-5 per unit-norm bond across
    four adversarial spectrum classes (baselines/cert_slack_experiment.py,
    compiled kernel), smoke-tier-asserted <= 5e-5
    (tests/test_tpu_smoke.py::test_compiled_jacobi_core_fast_cert_bound),
    bench uses 1e-4 = 2x the asserted ceiling.  Each bond theta has unit
    Frobenius norm (the state is normalized), so the per-bond constant
    applies as-is; one merged period updates L-1 bonds."""
    best, terr = _time_steady(psi, gates,
                              tp._replace(svd_method="jacobi_core_fast"),
                              n_periods)
    n_bond_updates = CONFIG["L"] - 1          # one merged Ising sweep
    cert = float(np.max(terr)) + n_bond_updates * CERT_SLACK_PER_BOND
    return best, cert


def run_steady_exact(psi, gates, tp, n_periods: int) -> float:
    """Bit-faithful steady leg: the full adaptive-exit Jacobi kernel
    (svd_method auto -> jacobi_sv on [512, 512] thetas), exact-class
    numerics (no projection; end-to-end trace error vs the f64 oracle
    ~3e-5 class, ops/pallas/jacobi_svd.jacobi_sv calibration notes)."""
    best, _ = _time_steady(psi, gates, tp, n_periods)
    return best


def run_steady_chi512(psi, gates, tp, n_timed: int):
    """Scaling-headroom leg: saturated steady throughput at DOUBLE the
    headline chi (chi=512 production, [1024, 1024] thetas), tracked per
    round instead of re-probed (round-4 VERDICT item 9).  The settled
    chi-256 state is zero-padded to the double width and evolved 10
    periods in two 5-period scan programs first -- the chunked-scan
    stability workaround from baselines/chi512_validation.py (one long
    chi=512 scan drove the axon worker into a crash/restart once); the
    occupancy grows into the new padding before the timed window."""
    from timecrystal_tpu.core.mps import pad_mps
    from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan

    chi2 = 2 * psi.lam.shape[-1]
    psi = pad_mps(psi, chi2)
    for _ in range(2):                       # chunked settle (see docstring)
        psi, tr = evolve_floquet_scan(psi, gates, 5, tp, frame="merged")
        np.asarray(tr["loschmidt_echo"])
    best, _ = _time_steady(psi, gates, tp, n_timed)
    return best, chi2


def main() -> None:
    from timecrystal_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    window = run_ensemble_window(ENSEMBLE_R, N_WINDOW)
    psi, gates, tp = _steady_state()
    steady, cert_err = run_steady(psi, gates, tp, N_STEADY)
    steady_exact = run_steady_exact(psi, gates, tp, N_STEADY)
    chi512, chi2 = run_steady_chi512(psi, gates, tp, N_STEADY // 2)

    denom_window = denom_steady = None
    # quick mode runs a tiny config: the recorded L=40 denominators do not
    # apply, so vs_baseline stays None (the contract test checks keys only)
    if not os.environ.get("TCT_BENCH_QUICK") and os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f).get(BASELINE_KEY, {})
        denom_steady = base.get("periods_per_second_tail")
        pp = base.get("per_period_seconds")
        if pp and len(pp) >= N_WINDOW:
            denom_window = N_WINDOW / sum(pp[:N_WINDOW])

    print(json.dumps({
        "metric": "ensemble_window_chain_periods_per_sec_L40_chi256_entangling",
        "value": round(window, 4),
        "unit": "chain-periods/s (R=%d disorder realizations x %d-period "
                "window, chi-staged vmapped, one v5e chip)"
                % (ENSEMBLE_R, N_WINDOW),
        "vs_baseline": round(window / denom_window, 3) if denom_window
        else None,
        "steady_periods_per_sec": round(steady, 4),
        "steady_vs_baseline": round(steady / denom_steady, 3)
        if denom_steady else None,
        # machine-checked accuracy certificate for the projected steady
        # path: per-period discarded-weight UPPER BOUND = max reported
        # trunc_err + (L-1) x measured overshoot ceiling (run_steady
        # docstring; slack pinned by the TPU smoke tier)
        "steady_cert_err_per_period": float(f"{cert_err:.3e}"),
        "steady_cert_slack_per_bond": CERT_SLACK_PER_BOND,
        # bit-faithful (non-projected) steady leg, same settled state
        "steady_exact_periods_per_sec": round(steady_exact, 4),
        "steady_exact_vs_baseline": round(steady_exact / denom_steady, 3)
        if denom_steady else None,
        # scaling headroom: saturated steady at double chi (chi=512 prod)
        "steady_chi%d_periods_per_sec" % chi2: round(chi512, 4),
        "baseline": "single-core NumPy/LAPACK TEBD (reference-equivalent, "
                    "dynamic rank); window %.4f p/s, steady %.4f p/s"
                    % (denom_window, denom_steady)
                    if denom_window and denom_steady else None,
    }))


_BACKEND_FAILURE_MARKS = ("FailedPrecondition", "DEADLINE_EXCEEDED",
                          "UNAVAILABLE", "Socket closed",
                          "failed to connect", "Connection reset",
                          "Accelerator device halted")


def _wait_for_backend(deadline_s: float = 10800.0) -> None:
    """Block until the jax backend initializes in a probe CHILD process.

    A wedged axon worker hangs device init indefinitely (observed: >1 h in
    one outage, >3 h in another), which the exception-based retry below can
    never see -- the process just stalls until the driver kills it.
    Probing in a subprocess with a timeout converts the hang into a
    retryable failure; the probe is pure init (no compile), so killing it
    mid-handshake does not wedge the worker further.  Gives up after
    ``deadline_s`` (TCT_BENCH_BACKEND_DEADLINE; default 3 h, sized to the
    longest measured outage -- an early give-up turns a recoverable wedge
    into a failed benchmark record, while a caller with a shorter budget
    kills the wait externally at no extra cost) and lets main() surface
    the real error."""
    import subprocess
    import sys

    if os.environ.get("TCT_BENCH_QUICK"):
        # smoke-tier children run under their own ~1100 s timeout; a
        # 25-minute wait here would convert a wedged worker into a
        # suite-level timeout instead of a clean retryable failure
        deadline_s = min(deadline_s, 300.0)
    deadline_s = float(os.environ.get("TCT_BENCH_BACKEND_DEADLINE",
                                      deadline_s))
    t_end = time.time() + deadline_s
    first = True
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                check=True, timeout=300,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() >= t_end:
                print("bench: backend probe never succeeded within "
                      f"{deadline_s:.0f}s; proceeding anyway",
                      file=sys.stderr)
                return
            if first:
                print("bench: backend unavailable; waiting for the TPU "
                      "worker to recover...", file=sys.stderr)
                first = False
            time.sleep(120)


def _main_with_retry() -> None:
    """One fresh-process retry on DEVICE failure only.

    The axon TPU worker can crash/restart mid-run (observed once under a
    heavy vmapped steady-state load); the wedged backend cannot recover
    in-process, so on a failure carrying a backend signature re-exec a
    fresh interpreter (fresh tunnel) once before giving up.  The retried
    run reuses the persistent XLA compilation cache, so it is warm.
    Deterministic errors (schema mismatch, ValueError...) re-raise
    immediately -- no 2-minute stall on a plain bug."""
    import sys
    import traceback

    try:
        _wait_for_backend()
        main()
    except Exception as e:
        is_device = any(m in (type(e).__name__ + " " + str(e))
                        for m in _BACKEND_FAILURE_MARKS)
        if not is_device or os.environ.get("TCT_BENCH_RETRIED"):
            raise
        traceback.print_exc()
        print("bench: device failure; retrying once in a fresh process...",
              file=sys.stderr)
        time.sleep(120)
        env = dict(os.environ, TCT_BENCH_RETRIED="1")
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)], env)


if __name__ == "__main__":
    _main_with_retry()
