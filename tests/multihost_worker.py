"""Worker program for the 2-process CPU cluster checks (tests/
test_multihost.py and __graft_entry__._dryrun_cluster_leg).

Each rank runs this file (``python multihost_worker.py RANK PORT OUT_NPZ``)
with 4 virtual CPU devices; the pair forms a jax.distributed cluster with
8 global devices and evolves the SAME ensemble problem the parent
computes single-process.  ``python multihost_worker.py single - OUT_NPZ``
computes the single-process (unsharded) reference for every leg in an
identically-configured process (CPU backend, x64), so parents never have
to mutate their own jax config to build the comparison.  Also imported BY
the parents for ``make_problem()``/``spawn_cluster()`` so the problem
definition and the launch harness exist exactly once.

Not collected by pytest (no test_ prefix, no test functions).
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_problem():
    """(h_fields, taus, basis, spec): small f64 ensemble, R=6 NOT a
    multiple of the 8-device global mesh (exercises padding)."""
    sys.path.insert(0, _REPO)
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.parallel.sweep import SweepSpec, _basis_indices

    spec = SweepSpec(L=8, chi=16, n_periods=4,
                     theta=0.95 * float(np.pi),
                     tp=TruncParams(chi_max=0, svd_min=1e-12),
                     dtype="float64")
    h_fields = np.random.RandomState(5).uniform(-0.3, 0.3, (6, spec.L))
    taus = 1.0 + 0.1 * np.arange(6, dtype=np.float64)
    basis = _basis_indices(spec.L, "neel")
    return h_fields, taus, basis, spec


def make_site_problem():
    """(psi0, gates, tp, n_periods) for the site-sharded leg: L=16 splits
    into even-length blocks over the 8 global devices (local length 2),
    same recipe as tests/test_parallel.py::TestSiteSharding."""
    sys.path.insert(0, _REPO)
    import jax.numpy as jnp

    from timecrystal_tpu.core.mps import create_initial_state
    from timecrystal_tpu.core.truncate import TruncParams
    from timecrystal_tpu.models.kicked_ising import (draw_disorder_reference,
                                                     make_floquet_gates)

    hf = draw_disorder_reference(16, 0.3, 42)
    gates = make_floquet_gates(1.0, jnp.asarray(hf, jnp.float64), 0.9,
                               theta=0.92 * np.pi, dtype=jnp.float64)
    psi0 = create_initial_state(16, "neel", chi=16, dtype=jnp.float64)
    tp = TruncParams(chi_max=0, svd_min=1e-14, svd_method="native")
    return psi0, gates, tp, 4


def spawn_cluster(out_paths, timeout: float = 600.0):
    """Launch the 2-rank cluster (and the 'single' reference process),
    wait for all three, and return {name: log}.  Kills stragglers on
    timeout; raises RuntimeError on any nonzero exit.  ``out_paths`` is a
    dict with keys 'rank0', 'rank1', 'single' -> npz paths."""
    import socket

    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # this file pins cpu via jax.config
    env["TCT_CKPT_TAG"] = str(port)  # unique shared ckpt dir per cluster run
    me = os.path.abspath(__file__)
    argvs = {
        "rank0": ["0", str(port), out_paths["rank0"]],
        "rank1": ["1", str(port), out_paths["rank1"]],
        "single": ["single", "-", out_paths["single"]],
    }
    procs = {name: subprocess.Popen(
        [sys.executable, me] + argv, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for name, argv in argvs.items()}
    logs = {}
    try:
        for name, p in procs.items():
            logs[name], _ = p.communicate(timeout=timeout)
    finally:
        for p in procs.values():
            if p.poll() is None:
                p.kill()
    for name, p in procs.items():
        if p.returncode != 0:
            raise RuntimeError(f"cluster process {name} failed:\n"
                               f"{logs.get(name, '')[-2000:]}")
    return logs


def _compute_all(mh=None):
    """Every leg's traces as one flat dict.  With ``mh`` (the multihost
    module): sharded over the global mesh.  Without: the single-process
    unsharded reference -- same keys, same problem."""
    from timecrystal_tpu.parallel.site_shard import (evolve_floquet_sharded,
                                                     site_mesh)
    from timecrystal_tpu.parallel.sweep import evolve_batch, evolve_batch_auto

    h_fields, taus, basis, spec = make_problem()
    if mh is not None:
        traces = mh.evolve_batch_multihost(h_fields, taus, basis, spec)
    else:
        import jax.numpy as jnp

        traces = evolve_batch(jnp.asarray(h_fields), jnp.asarray(taus),
                              jnp.asarray(basis), spec)
    out = {k: np.asarray(v) for k, v in traces.items()}

    # drive-strength (per-realization thetas) leg: the axis threads
    # through the multi-process path (round-4 VERDICT seam #3a)
    import jax.numpy as jnp

    thetas = np.pi * (1.0 - np.linspace(0.0, 0.1, len(taus)))
    if mh is not None:
        th_tr = mh.evolve_batch_multihost(h_fields, taus, basis, spec,
                                          thetas=thetas)
    else:
        th_tr = evolve_batch(jnp.asarray(h_fields), jnp.asarray(taus),
                             jnp.asarray(basis), spec,
                             thetas=jnp.asarray(thetas))
    out.update({f"thetas_{k}": np.asarray(th_tr[k])
                for k in ("sz_sites", "staggered_magnetization",
                          "loschmidt_echo", "trunc_err")})

    # chi-staged production driver (escalation decisions allgathered on a
    # cluster; plain device_get single-process)
    staged, info = evolve_batch_auto(h_fields, taus, basis, spec,
                                     chi_start=4, chunk_periods=2,
                                     mesh=mh.global_mesh() if mh else None)
    out.update({f"staged_{k}": np.asarray(v) for k, v in staged.items()})
    out["staged_n_escalations"] = np.asarray(len(info["chi_escalations"]))

    # site-axis sharding: the one path with collectives INSIDE the step
    # (ppermute boundary-bond exchange + LE ring relay).  The reference
    # is the genuinely UNSHARDED single-device scan.
    spsi0, sgates, stp, n_site = make_site_problem()
    if mh is not None:
        _, site_tr = evolve_floquet_sharded(spsi0, sgates, n_site, stp,
                                            site_mesh())
        site_tr = mh.gather(site_tr)
    else:
        from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan

        _, site_tr = evolve_floquet_scan(spsi0, sgates, n_site, stp)
    out.update({f"site_{k}": np.asarray(v)
                for k, v in site_tr.items()
                if k in ("sz_sites", "loschmidt_echo", "trunc_err")})

    # per-rank shard checkpointing (cluster only): kill the staged driver
    # after its FIRST state save (both ranks die at the same chunk -- SPMD
    # control flow is identical), resume in-process, and emit the resumed
    # traces; the test asserts them equal to the straight staged leg above
    # and to the single-process reference.
    if mh is not None:
        import tempfile

        from timecrystal_tpu.utils import checkpoint as ck_mod

        ckdir = os.path.join(tempfile.gettempdir(),
                             f"tct_mh_ckpt_{os.environ.get('TCT_CKPT_TAG', '')}")
        # a stale rank dir from a previous run would resume instead of
        # exercising the kill; each rank cleans only ITS OWN subdirectory
        import shutil

        import jax as _jax

        shutil.rmtree(os.path.join(
            ckdir, f"rank_{_jax.process_index():04d}"), ignore_errors=True)
        orig_save = ck_mod.save_state
        n_saves = []

        def dying_save(*a, **kw):
            r = orig_save(*a, **kw)
            n_saves.append(1)
            if len(n_saves) == 1:
                raise KeyboardInterrupt("injected kill after first chunk")
            return r

        ck_mod.save_state = dying_save
        died = False
        try:
            evolve_batch_auto(h_fields, taus, basis, spec, chi_start=4,
                              chunk_periods=2, mesh=mh.global_mesh(),
                              checkpoint_dir=ckdir)
        except KeyboardInterrupt:
            died = True
        finally:
            ck_mod.save_state = orig_save
        assert died, "injected kill never fired (no state save happened)"
        resumed, _ = evolve_batch_auto(h_fields, taus, basis, spec,
                                       chi_start=4, chunk_periods=2,
                                       mesh=mh.global_mesh(),
                                       checkpoint_dir=ckdir)
        out.update({f"ckpt_{k}": np.asarray(v) for k, v in resumed.items()
                    if k in ("sz_sites", "loschmidt_echo",
                             "staggered_magnetization", "trunc_err")})

    # memory-channel ensemble (analysis/memory): the (gamma x trajectory)
    # stochastic-dephasing batch over the global mesh; keys are
    # deterministic so every rank builds identical rows and the
    # allgathered envelope must match the unsharded reference bit-exactly
    from timecrystal_tpu.analysis.memory import scan_memory_lifetime

    mem = scan_memory_lifetime([0.02, 0.08], L=6, h_over_J=0.3, eps=0.05,
                               n_periods=3, n_trajectories=3, chi=8,
                               coherence_leg=False,
                               mesh=mh.global_mesh() if mh else None)
    out["memory_envelope"] = np.asarray(mem["envelope"])
    return out


def main() -> None:
    role, port, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    single = role == "single"
    # fresh virtual CPU topology regardless of the parent's flags: ranks
    # get 4 devices each (8 global); the reference gets all 8 locally
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + ("8" if single else "4"))
    import faulthandler

    faulthandler.dump_traceback_later(240, exit=True)  # hang -> loud death
    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # update is honored (same reason as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, _REPO)
    from timecrystal_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if single:
        np.savez(out_path, **_compute_all(mh=None))
        print("single-process reference done", flush=True)
        return

    from timecrystal_tpu.parallel import multihost as mh

    mh.initialize(f"localhost:{port}", num_processes=2, process_id=int(role))
    mh.initialize()   # second call: the already-initialized no-op branch
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4
    np.savez(out_path, **_compute_all(mh=mh))
    print(f"rank {role} done", flush=True)


if __name__ == "__main__":
    main()
