"""Worker-fault recovery supervisor tests (analysis/faultsafe.py).

The real fault class is the axon worker's data-dependent batched-eigh
kernel fault (baselines/gram_eigh_fault_probe.py), which kills the whole
client process.  These tests inject that death into the supervised child
(a printed failure signature + os._exit after N completed chunks, firing
only without the fallback SVD routing -- mirroring the real fault's
data dependence) and assert the supervisor resumes at the incomplete
chunk and reproduces the straight in-process sweep.
"""

import numpy as np
import pytest

from timecrystal_tpu.analysis.faultsafe import sweep_phase_grid_faultsafe
from timecrystal_tpu.analysis.phase_diagram import sweep_phase_grid

H_VALUES = [0.2, 0.5]
T_VALUES = [2.0]
PARAMS = {"J": 1.0, "RANDOM_SEED": 42, "SVD_MIN": 1e-12,
          "SVD_CUTOFF": 1e-7}


class TestFaultRecovery:
    def test_injected_fault_recovers_and_matches(self, tmp_path):
        """Child dies mid-sweep after 1 of 2 chunks (simulated kernel
        fault); the supervisor restarts with the fallback routing, the
        completed chunk is KEPT (svd_method-neutral fingerprint), and the
        final result equals the straight in-process sweep."""
        ref = sweep_phase_grid(H_VALUES, T_VALUES, PARAMS)
        res = sweep_phase_grid_faultsafe(
            H_VALUES, T_VALUES, PARAMS, chunk_size=1,
            checkpoint_dir=str(tmp_path / "ck"),
            fallback_svd_method="native",    # CPU-fast stand-in for the
            _test_kill_after_chunk=1)        # production 'jacobi' fallback
        assert res["recovery"]["fault_recovered"] is True
        assert res["recovery"]["attempts"] == 2
        assert res["recovery"]["svd_method"] == "native"
        assert len(res["records"]) == len(ref["records"]) == 2
        for got, want in zip(res["records"], ref["records"]):
            assert got["success"] and want["success"]
            np.testing.assert_allclose(got["A2T"], want["A2T"], atol=1e-12)
            np.testing.assert_allclose(got["dtc_score_raw"],
                                       want["dtc_score_raw"], atol=1e-12)
        for k in ("loschmidt_echo", "staggered_magnetization"):
            np.testing.assert_allclose(res["traces"][k], ref["traces"][k],
                                       atol=1e-12, err_msg=k)

    def test_no_fault_single_attempt(self, tmp_path):
        """Without injection the supervisor runs one child and returns
        the plain contract (recovery bookkeeping says so)."""
        res = sweep_phase_grid_faultsafe(
            H_VALUES, T_VALUES, PARAMS, chunk_size=2,
            checkpoint_dir=str(tmp_path / "ck"))
        assert res["recovery"]["attempts"] == 1
        assert res["recovery"]["fault_recovered"] is False
        assert len(res["records"]) == 2

    def test_deterministic_error_does_not_retry(self, tmp_path):
        """A child death WITHOUT a worker-failure signature re-raises
        immediately -- retries are reserved for retryable faults."""
        with pytest.raises(RuntimeError, match="deterministic error"):
            sweep_phase_grid_faultsafe(
                H_VALUES, T_VALUES, PARAMS, chi_pad=-4,
                checkpoint_dir=str(tmp_path / "ck"))
