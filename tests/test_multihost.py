"""Multi-host (DCN) sweep scale-out tests (parallel/multihost.py).

Two tiers:
  * single-process: the multihost API on the local 8-device virtual mesh
    must reproduce the unsharded batch exactly (it degenerates to the
    evolve_batch_sharded SPMD structure);
  * 2-process cluster: a REAL jax.distributed CPU cluster (2 ranks x 4
    virtual devices, Gloo collectives over localhost) evolves the same
    ensemble; every rank's allgathered traces must equal the
    single-process result.  This is the closest a single host can get to
    validating the DCN path (SURVEY.md section 5: batch axis over DCN
    across hosts).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from timecrystal_tpu.parallel import multihost as mh
from timecrystal_tpu.parallel.sweep import evolve_batch

from multihost_worker import make_problem

_HERE = os.path.dirname(os.path.abspath(__file__))
_TRACE_KEYS = ("sz_sites", "staggered_magnetization", "magnetization",
               "loschmidt_echo", "entropy_mid", "max_chi", "trunc_err")


def _reference_traces():
    """Unsharded single-process traces for the shared problem."""
    import jax.numpy as jnp

    h_fields, taus, basis, spec = make_problem()
    out = evolve_batch(jnp.asarray(h_fields), jnp.asarray(taus),
                       jnp.asarray(basis), spec)
    return {k: np.asarray(v) for k, v in out.items()}


class TestSingleProcess:
    def test_matches_unsharded(self):
        """evolve_batch_multihost on the local mesh == plain evolve_batch,
        including the non-multiple-of-mesh batch padding (R=6 on 8)."""
        h_fields, taus, basis, spec = make_problem()
        ref = _reference_traces()
        mesh = mh.global_mesh()
        assert mesh.devices.size == 8    # conftest virtual mesh
        got = mh.evolve_batch_multihost(h_fields, taus, basis, spec,
                                        mesh=mesh)
        for k in _TRACE_KEYS:
            assert got[k].shape == ref[k].shape, k
            np.testing.assert_allclose(got[k], ref[k], atol=1e-12, err_msg=k)

    def test_initialize_noop_single_process(self):
        """initialize() must be callable repeatedly once a client exists
        (shared entry points call it unconditionally)."""
        import jax

        if jax._src.distributed.global_state.client is None:
            pytest.skip("no distributed client in this process (expected); "
                        "the no-op branch is exercised in the worker")
        mh.initialize()     # second call: must not raise

    def test_disorder_ensemble_multihost_contract(self):
        """Same traces as the fixed-chi disorder_ensemble for the same
        key (deterministic jax.random draw, no communication)."""
        import jax

        from timecrystal_tpu.parallel.sweep import disorder_ensemble

        _, _, _, spec = make_problem()
        key = jax.random.PRNGKey(3)
        ref = disorder_ensemble(key, 5, spec, h_disorder=0.3, tau=1.1)
        got = mh.disorder_ensemble_multihost(key, 5, spec, h_disorder=0.3,
                                             tau=1.1)
        for k in _TRACE_KEYS:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]),
                                       atol=1e-12, err_msg=k)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTwoProcessCluster:
    def test_cluster_matches_single_process(self, tmp_path):
        """2-rank jax.distributed CPU cluster (8 global devices) ==
        single-process unsharded traces, identical on every rank."""
        worker = os.path.join(_HERE, "multihost_worker.py")
        port = _free_port()
        outs = [str(tmp_path / f"rank{r}.npz") for r in (0, 1)]
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)   # worker pins cpu via jax.config
        procs = [subprocess.Popen(
            [sys.executable, worker, str(r), str(port), outs[r]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for r in (0, 1)]
        logs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=300)
                logs.append(out)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        for r, p in enumerate(procs):
            assert p.returncode == 0, \
                f"rank {r} failed:\n{logs[r] if r < len(logs) else ''}"

        ref = _reference_traces()
        rank_traces = []
        for o in outs:
            with np.load(o) as z:
                rank_traces.append({k: z[k] for k in z.files})
        for k in _TRACE_KEYS:
            # every rank allgathers the identical full batch
            np.testing.assert_array_equal(rank_traces[0][k],
                                          rank_traces[1][k], err_msg=k)
            np.testing.assert_allclose(rank_traces[0][k], ref[k],
                                       atol=1e-12, err_msg=k)

        # the chi-staged driver across the cluster: identical schedule on
        # every rank, traces equal to the single-process staged run
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        h_fields, taus, basis, spec = make_problem()
        ref_staged, ref_info = evolve_batch_auto(h_fields, taus, basis, spec,
                                                 chi_start=4, chunk_periods=2)
        assert (int(rank_traces[0]["staged_n_escalations"])
                == int(rank_traces[1]["staged_n_escalations"])
                == len(ref_info["chi_escalations"]))
        for k in _TRACE_KEYS:
            np.testing.assert_array_equal(rank_traces[0][f"staged_{k}"],
                                          rank_traces[1][f"staged_{k}"],
                                          err_msg=k)
            np.testing.assert_allclose(rank_traces[0][f"staged_{k}"],
                                       np.asarray(ref_staged[k]),
                                       atol=1e-12, err_msg=k)

        # site-axis sharding: ppermutes crossed the process boundary; the
        # traces must still match the single-device scan exactly
        from multihost_worker import make_site_problem

        from timecrystal_tpu.dynamics.tebd import evolve_floquet_scan

        spsi0, sgates, stp, n_site = make_site_problem()
        _, site_ref = evolve_floquet_scan(spsi0, sgates, n_site, stp)
        for k in ("sz_sites", "loschmidt_echo", "trunc_err"):
            np.testing.assert_array_equal(rank_traces[0][f"site_{k}"],
                                          rank_traces[1][f"site_{k}"],
                                          err_msg=k)
            np.testing.assert_allclose(rank_traces[0][f"site_{k}"],
                                       np.asarray(site_ref[k]),
                                       atol=1e-13, err_msg=k)

    def test_checkpoint_rejected_multiprocess(self):
        """The staged driver must REFUSE checkpoint_dir on a multi-process
        mesh (single-process here, so exercise the guard directly)."""
        from timecrystal_tpu.parallel.sweep import evolve_batch_auto

        h_fields, taus, basis, spec = make_problem()
        # monkeypatch-free: the guard reads jax.process_count()
        import jax

        orig = jax.process_count
        jax.process_count = lambda *a, **kw: 2
        try:
            with pytest.raises(ValueError, match="multi-process"):
                evolve_batch_auto(h_fields, taus, basis, spec,
                                  chi_start=4, chunk_periods=2,
                                  mesh=mh.global_mesh(),
                                  checkpoint_dir="/tmp/never-used")
        finally:
            jax.process_count = orig
