"""Accelerator-backend liveness probing.

A wedged axon TPU worker hangs ``jax.devices()`` indefinitely (observed
>1 h; the same failure mode bench.py._wait_for_backend guards with a retry
loop).  User-facing entry points (main.py, examples) probe backend init in
a CHILD process with a timeout instead, converting the hang into a clean
CPU fallback: a healthy axon tunnel initializes in ~5-15 s, so a 120 s
deadline separates wedged from healthy with margin.

The reference has no analog (CPU-only, no device to wedge); this is
TPU-operations infrastructure.
"""

from __future__ import annotations

import os
import subprocess
import sys

_ENV_DEADLINE = "TCT_BACKEND_PROBE_DEADLINE"

# Signatures of accelerator/worker failures (vs deterministic Python bugs):
# matched against exception text or a child process's output to decide
# whether a retry in a fresh process can help.  Shared by bench.py's
# retry-once logic and the sweep fault-recovery supervisor
# (analysis/faultsafe.py).
BACKEND_FAILURE_MARKS = ("FailedPrecondition", "DEADLINE_EXCEEDED",
                         "UNAVAILABLE", "Socket closed",
                         "failed to connect", "Connection reset",
                         "Accelerator device halted",
                         "TPU worker process crashed",
                         "worker process crashed or restarted")


def is_backend_failure(text: str) -> bool:
    """True when exception text / child output carries a worker-failure
    signature (retryable in a fresh process), as opposed to a
    deterministic error that would just fail again."""
    return any(m in text for m in BACKEND_FAILURE_MARKS)


def backend_available(deadline_s: float | None = None) -> bool:
    """True when the default jax backend initializes in a child process
    within ``deadline_s`` (default 120 s; override or disable (<= 0) via
    TCT_BACKEND_PROBE_DEADLINE).  The probe is pure init, so killing it
    mid-handshake does not wedge the worker further."""
    if deadline_s is None:
        deadline_s = float(os.environ.get(_ENV_DEADLINE, 120.0))
    if deadline_s <= 0:
        return True
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            check=True, timeout=deadline_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def ensure_responsive_backend(warn: bool = True) -> bool:
    """Force the CPU backend when the accelerator fails the liveness probe.

    Returns True when the fallback was taken.  Must run BEFORE any device
    use (jax platform config is init-time).  No-op (False) on a healthy
    backend."""
    if backend_available():
        return False
    import jax
    jax.config.update("jax_platforms", "cpu")
    if warn:
        print("WARNING: accelerator backend failed to initialize within "
              "the deadline (wedged/absent TPU worker); falling back to "
              "the CPU backend.", file=sys.stderr)
    return True


def auto_chunk_rows(chi: int, n_bonds: int = 15) -> int:
    """Default rows-per-device-program under the axon worker's
    program-size limit.

    Big vmapped TEBD batches kernel-fault the TPU worker; the measured
    fault boundary scales roughly with rows * chi^2 VMEM footprint
    (40 rows at chi=48 runs, 120 at chi=48 and 32 at chi=96 fault --
    analysis/phase_diagram, analysis/memory, and
    examples/phase_diagram_hires measurements).  ~92k row*chi^2 keeps
    headroom; floor 4 so tiny rows still batch.  Chunking never changes
    results (rows are position-independent; chunked == single-program
    bit-exactly, tested), so the only cost of a conservative default is
    dispatch overhead.

    ``n_bonds``: per-row VMEM also scales with the chain's bond count;
    the ~92k envelope was calibrated at L=16 (15 bonds).  Callers with a
    user-set L pass ``L - 1`` so e.g. an L=40 chi=48 memory scan gets
    ~2.6x smaller chunks than the calibration chain instead of silently
    re-entering the measured fault region.  Shorter chains are NOT scaled
    up (the calibration point is the proven-safe maximum per row).
    """
    scale = max(float(n_bonds) / 15.0, 1.0)
    return max(4, int(92_160 // max(scale * chi * chi, 1.0)))
