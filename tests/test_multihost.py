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

import numpy as np
import pytest

from timecrystal_tpu.parallel import multihost as mh
from timecrystal_tpu.parallel.sweep import evolve_batch

from multihost_worker import make_problem

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

    def test_thetas_matches_unsharded(self):
        """Per-realization thetas (drive-strength axis) through the
        multihost path == plain evolve_batch with the same thetas
        (round-4 VERDICT seam: previously NotImplementedError)."""
        import jax.numpy as jnp

        h_fields, taus, basis, spec = make_problem()
        thetas = np.pi * (1.0 - np.linspace(0.0, 0.1, len(taus)))
        ref = evolve_batch(jnp.asarray(h_fields), jnp.asarray(taus),
                           jnp.asarray(basis), spec,
                           thetas=jnp.asarray(thetas))
        got = mh.evolve_batch_multihost(h_fields, taus, basis, spec,
                                        mesh=mh.global_mesh(),
                                        thetas=thetas)
        for k in _TRACE_KEYS:
            np.testing.assert_allclose(got[k], np.asarray(ref[k]),
                                       atol=1e-12, err_msg=k)

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


class TestTwoProcessCluster:
    def test_cluster_matches_single_process(self, tmp_path):
        """2-rank jax.distributed CPU cluster (8 global devices): fixed,
        chi-staged, and site-sharded legs identical on every rank and
        equal to an identically-configured single-process reference
        (computed by the 'single' worker role -- same CPU/x64 config, so
        the comparison never depends on this process's jax state)."""
        from multihost_worker import spawn_cluster

        paths = {name: str(tmp_path / f"{name}.npz")
                 for name in ("rank0", "rank1", "single")}
        # 600 s: a COLD compilation cache compiles every leg (fixed +
        # thetas + staged + ckpt-resume + site + memory) from scratch in
        # three child processes -- measured ~300 s total, which the old
        # 300 s budget hit exactly; warm-cache runs take ~70 s
        spawn_cluster(paths, timeout=600)

        data = {}
        for name, o in paths.items():
            with np.load(o) as z:
                data[name] = {k: z[k] for k in z.files}
        r0, r1, ref = data["rank0"], data["rank1"], data["single"]
        # every rank allgathers the identical full result for every leg
        for k in r0:
            np.testing.assert_array_equal(r0[k], r1[k], err_msg=k)
        for k in _TRACE_KEYS:                      # fixed-chi leg
            np.testing.assert_allclose(r0[k], ref[k], atol=1e-12, err_msg=k)
        assert (int(r0["staged_n_escalations"])    # staged leg: same ladder
                == int(ref["staged_n_escalations"]))
        for k in _TRACE_KEYS:
            np.testing.assert_allclose(r0[f"staged_{k}"], ref[f"staged_{k}"],
                                       atol=1e-12, err_msg=k)
        for k in ("sz_sites", "loschmidt_echo", "trunc_err"):   # site leg
            np.testing.assert_allclose(r0[f"site_{k}"], ref[f"site_{k}"],
                                       atol=1e-13, err_msg=k)
        # memory-channel leg (analysis/memory over the global mesh)
        np.testing.assert_allclose(r0["memory_envelope"],
                                   ref["memory_envelope"], atol=1e-12)
        # drive-strength leg: per-realization thetas across the cluster
        for k in ("thetas_sz_sites", "thetas_staggered_magnetization",
                  "thetas_loschmidt_echo", "thetas_trunc_err"):
            np.testing.assert_allclose(r0[k], ref[k], atol=1e-12, err_msg=k)
        # per-rank shard checkpointing: the staged driver killed after its
        # first state save and resumed IN the cluster must reproduce both
        # the straight cluster staged leg and the single-process reference
        for k in ("sz_sites", "loschmidt_echo", "staggered_magnetization",
                  "trunc_err"):
            np.testing.assert_allclose(r0[f"ckpt_{k}"], r0[f"staged_{k}"],
                                       atol=1e-12, err_msg=k)
            np.testing.assert_allclose(r0[f"ckpt_{k}"], ref[f"staged_{k}"],
                                       atol=1e-12, err_msg=k)

    def test_phase_grid_checkpoint_rejected_multiprocess(self):
        """sweep_phase_grid must refuse checkpoint_dir multi-process:
        ranks would race the same chunk/manifest files."""
        import jax

        from timecrystal_tpu.analysis.phase_diagram import sweep_phase_grid

        orig = jax.process_count
        jax.process_count = lambda *a, **kw: 2
        try:
            with pytest.raises(ValueError, match="multi-process"):
                sweep_phase_grid([0.2], [2.0], {},
                                 checkpoint_dir="/tmp/never-used")
        finally:
            jax.process_count = orig
