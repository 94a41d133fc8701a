"""Worker-fault recovery for production phase-diagram sweeps.

The axon TPU worker's batched-eigh kernel fault is DATA-dependent and has
moved between worker versions (baselines/gram_eigh_fault_probe.py;
PERFORMANCE.md round-4 regression note): a program that ran in one round
kernel-faulted in the next.  A kernel fault kills the whole client
process, so in-process try/except cannot recover -- and the default
``python main.py --phase-only`` production sweep used to die with it.

This module supervises the sweep from OUTSIDE the faultable process:

  1. the grid evolves in a CHILD process that persists every completed
     chunk through ``sweep_phase_grid``'s checkpointer;
  2. a child death carrying a worker-failure signature
     (utils.backend.BACKEND_FAILURE_MARKS, or a signal kill) restarts a
     fresh child -- with ``svd_method='jacobi'`` from the first retry on,
     the kernel whose rows*chi^2 envelope is data-INDEPENDENT -- which
     resumes at the first incomplete chunk (completed chunks are kept
     across the backend switch: the fingerprint is svd_method-neutral);
  3. the parent then loads every chunk from the checkpoint directory and
     scores the grid host-side (no device work left), returning the
     ``sweep_phase_grid`` result contract plus a ``recovery`` record.

The reference has no analog (CPU-only, nothing to fault); this is the
TPU-operations complement of the per-point NaN masking in
analysis/detection.py (SURVEY.md section 5 'failure detection').
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from typing import Dict

import numpy as np

__all__ = ["sweep_phase_grid_faultsafe"]


def sweep_phase_grid_faultsafe(h_values, T_values, params: Dict,
                               chi_pad: int = 32,
                               chunk_size: int | None = None,
                               checkpoint_dir: str | None = None,
                               max_restarts: int = 2,
                               fallback_svd_method: str = "jacobi",
                               show_progress: bool = False,
                               _test_kill_after_chunk: int | None = None
                               ) -> Dict:
    """``sweep_phase_grid`` that survives a kernel-faulted chunk.

    Evolves the grid in a supervised child process with per-chunk
    checkpointing; a child death with a worker-failure signature restarts
    it (``max_restarts`` times) with ``fallback_svd_method`` routing, and
    a death WITHOUT one re-raises immediately (a deterministic bug must
    not burn retries).  Returns the ``sweep_phase_grid`` dict plus
    ``recovery`` = {"attempts", "fault_recovered", "svd_method"}.

    ``checkpoint_dir`` defaults to a fresh temporary directory (pass one
    to ALSO get kill-and-resume across supervisor deaths).

    ``_test_kill_after_chunk`` is the fault-injection hook for the
    regression test: the child simulates a worker kernel fault (prints a
    failure signature and dies) after completing that many chunks -- only
    on attempts WITHOUT the fallback routing, mirroring the real
    gram_eigh fault class (data-dependent eigh faults; the Jacobi kernel
    is envelope-bound regardless of data).
    """
    from .phase_diagram import sweep_phase_grid

    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="tct_faultsafe_")
    B = len(np.asarray(h_values).ravel()) * len(np.asarray(T_values).ravel())
    # pinned here so parent and every child agree on the chunk->row map
    cs = int(chunk_size or max(1, -(-B // 8)))

    import jax

    spec = {
        "h_values": np.asarray(h_values, float).tolist(),
        "T_values": np.asarray(T_values, float).tolist(),
        "params": {k: v for k, v in params.items()
                   if isinstance(v, (int, float, str, bool))},
        "chi_pad": int(chi_pad),
        "chunk_size": cs,
        "checkpoint_dir": os.path.abspath(checkpoint_dir),
        "svd_method": None,
        "force_cpu": jax.default_backend() == "cpu",
        "x64": bool(jax.config.jax_enable_x64),
        "test_kill_after_chunk": _test_kill_after_chunk,
    }

    from ..utils.backend import is_backend_failure

    attempts = 0
    recovered = False
    while True:
        attempts += 1
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            json.dump(spec, f)
            spec_path = f.name
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "timecrystal_tpu.analysis.faultsafe",
                 spec_path],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))))
        finally:
            os.unlink(spec_path)
        if proc.returncode == 0:
            break
        # negative returncode = killed by signal (segfault-class worker
        # death); positive with a failure signature = the usual
        # XlaRuntimeError surface of a kernel fault
        fault = proc.returncode < 0 or is_backend_failure(proc.stdout or "")
        if not fault or attempts > max_restarts:
            raise RuntimeError(
                f"phase-grid child failed (attempt {attempts}, "
                f"exit {proc.returncode}, "
                f"{'worker fault' if fault else 'deterministic error'}):\n"
                f"{(proc.stdout or '')[-3000:]}")
        recovered = True
        spec["svd_method"] = fallback_svd_method
        print(f"sweep_phase_grid_faultsafe: worker fault on attempt "
              f"{attempts}; restarting with svd_method="
              f"'{fallback_svd_method}' (completed chunks kept)",
              file=sys.stderr)

    # all chunks are on disk: this call does NO device evolution, only
    # chunk loads + host-side scoring
    res = sweep_phase_grid(h_values, T_values, params, mesh=None,
                           chi_pad=chi_pad, show_progress=show_progress,
                           checkpoint_dir=checkpoint_dir, chunk_size=cs,
                           svd_method=spec["svd_method"])
    res["recovery"] = {"attempts": attempts, "fault_recovered": recovered,
                       "svd_method": spec["svd_method"] or "auto",
                       "checkpoint_dir": checkpoint_dir}
    return res


def _worker_main(spec_path: str) -> None:
    with open(spec_path) as f:
        spec = json.load(f)
    import jax

    if spec.get("force_cpu"):
        jax.config.update("jax_platforms", "cpu")
    if spec.get("x64"):
        jax.config.update("jax_enable_x64", True)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    kill_after = spec.get("test_kill_after_chunk")
    if kill_after is not None and not spec.get("svd_method"):
        # fault injection (test-only): die like a kernel-faulted worker
        # after `kill_after` completed chunks -- but only without the
        # fallback routing, like the real data-dependent eigh fault
        from ..utils import checkpoint as ck_mod

        orig = ck_mod.SweepCheckpointer.save_chunk
        count = [0]

        def dying_save(self, chunk_id, traces, extra=None):
            orig(self, chunk_id, traces, extra)
            count[0] += 1
            if count[0] >= int(kill_after):
                print("INTERNAL: Accelerator device halted prematurely: "
                      "TPU worker process crashed or restarted "
                      "(injected test fault)", flush=True)
                os._exit(1)

        ck_mod.SweepCheckpointer.save_chunk = dying_save

    from .phase_diagram import sweep_phase_grid

    sweep_phase_grid(spec["h_values"], spec["T_values"], spec["params"],
                     mesh=None, chi_pad=spec["chi_pad"],
                     checkpoint_dir=spec["checkpoint_dir"],
                     chunk_size=spec["chunk_size"],
                     svd_method=spec.get("svd_method"))
    print("faultsafe worker: all chunks complete", flush=True)


if __name__ == "__main__":
    _worker_main(sys.argv[1])
