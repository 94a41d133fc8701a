"""Worker program for tests/test_multihost.py's 2-process CPU cluster.

Each rank runs this file (``python multihost_worker.py RANK PORT OUT_NPZ``)
with 4 virtual CPU devices; the pair forms a jax.distributed cluster with
8 global devices and evolves the SAME ensemble problem the parent test
computes single-process.  Also imported BY the test for ``make_problem()``
so the problem definition exists exactly once.

Not collected by pytest (no test_ prefix, no test functions).
"""

from __future__ import annotations

import os
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


def main() -> None:
    rank, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    # fresh 4-device virtual CPU topology regardless of the parent's flags
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import faulthandler

    faulthandler.dump_traceback_later(240, exit=True)  # hang -> loud death
    import jax

    # the axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # update is honored (same reason as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    sys.path.insert(0, _REPO)
    from timecrystal_tpu.parallel import multihost as mh
    from timecrystal_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mh.initialize(f"localhost:{port}", num_processes=2, process_id=rank)
    mh.initialize()   # second call: the already-initialized no-op branch
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    h_fields, taus, basis, spec = make_problem()
    traces = mh.evolve_batch_multihost(h_fields, taus, basis, spec)

    # the chi-staged production driver on the same global mesh: per-chunk
    # escalation decisions allgathered, shared schedule across ranks
    from timecrystal_tpu.parallel.sweep import evolve_batch_auto

    staged, info = evolve_batch_auto(h_fields, taus, basis, spec,
                                     chi_start=4, chunk_periods=2,
                                     mesh=mh.global_mesh())
    out = {k: np.asarray(v) for k, v in traces.items()}
    out.update({f"staged_{k}": np.asarray(v) for k, v in staged.items()})
    out["staged_n_escalations"] = np.asarray(len(info["chi_escalations"]))

    # site-axis sharding across the cluster: the one path with collectives
    # INSIDE the step (ppermute boundary-bond exchange + LE ring relay now
    # riding the cross-process channel)
    from timecrystal_tpu.parallel.site_shard import (evolve_floquet_sharded,
                                                     site_mesh)

    spsi0, sgates, stp, n_site = make_site_problem()
    _, site_tr = evolve_floquet_sharded(spsi0, sgates, n_site, stp,
                                        site_mesh())
    out.update({f"site_{k}": np.asarray(v)
                for k, v in mh.gather(site_tr).items()})
    np.savez(out_path, **out)
    print(f"rank {rank} done", flush=True)


if __name__ == "__main__":
    main()
