#!/usr/bin/env python3
"""Multi-host (DCN) ensemble demo: a 2-process jax.distributed cluster on
this machine evolving one disorder ensemble over the GLOBAL device mesh.

    python examples/multihost_demo.py            # self-spawns 2 ranks
    python examples/multihost_demo.py --rank N --port P --ranks K
                                                 # run as one rank of K

On a real multi-host deployment (TPU pod slices over DCN, or a CPU/GPU
cluster) every host runs the rank form -- or just calls
``multihost.initialize()`` with no arguments where the environment
auto-detects (TPU pods, SLURM) -- and the program body below is unchanged:
that is the point of the SPMD design (parallel/multihost.py).

The self-spawned demo uses CPU ranks with 4 virtual devices each so it
runs anywhere; the rank program never mentions that — the same code
drives 8 TPU chips per host.
"""

import argparse
import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def rank_main(rank: int, ranks: int, port: int) -> None:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=4")
    import jax

    if os.environ.get("TCT_DEMO_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, _REPO)
    import numpy as np

    from timecrystal_tpu.core import observables as obs
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.parallel import SweepSpec, multihost as mh

    mh.initialize(f"localhost:{port}", num_processes=ranks, process_id=rank)
    mesh = mh.global_mesh()
    if rank == 0:
        print(f"cluster up: {ranks} processes, "
              f"{mesh.devices.size} global devices")

    # one disorder ensemble, batch axis sharded over every device of every
    # process; traces come back in full on every rank
    spec = SweepSpec(L=12, chi=32, n_periods=60, theta=0.97 * float(np.pi),
                     tp=TruncParams(chi_max=32, svd_min=1e-7))
    traces = mh.disorder_ensemble_multihost(
        jax.random.PRNGKey(7), n_realizations=16, spec=spec,
        h_disorder=0.3, tau=1.0, mesh=mesh)

    if rank == 0:
        times = 2.0 * np.arange(spec.n_periods + 1)
        a2t = [obs.extract_subharmonic_amplitude(times, np.asarray(s), 2.0)
               for s in traces["staggered_magnetization"]]
        print(f"ensemble: {traces['sz_sites'].shape[0]} realizations x "
              f"{spec.n_periods} periods, L={spec.L}")
        print(f"subharmonic A2T: mean {np.mean(a2t):.3f}  "
              f"min {np.min(a2t):.3f}  (DTC regime: ~1)")


def spawn_cluster(ranks: int) -> None:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--rank", str(r),
         "--ranks", str(ranks), "--port", str(port)])
        for r in range(1, ranks)]
    try:
        rank_main(0, ranks, port)
    finally:
        # run rank 0's shutdown barrier NOW: the other ranks' atexit
        # shutdown waits on it, and we are about to wait on their exit.
        # Best-effort (rank 0 may have failed before initialize), and never
        # mask the real exception; kill stragglers instead of hanging.
        try:
            import jax

            jax.distributed.shutdown()
        except Exception:
            pass
        for p in procs:
            try:
                p.wait(timeout=60)
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--ranks", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()
    if args.rank is None:
        spawn_cluster(args.ranks)
    else:
        rank_main(args.rank, args.ranks, args.port)
