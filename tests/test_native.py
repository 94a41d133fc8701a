"""Native C++ statevector oracle: build, cross-validate vs the NumPy oracle,
and large-L parity check of the MPS evolution that the dense-matrix oracle
cannot reach."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.exact_reference import evolve_exact

from timecrystal_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ / native build unavailable")


class TestNativeOracle:
    def test_matches_numpy_oracle(self):
        L, n = 8, 6
        np.random.seed(7)
        hf = np.random.uniform(-0.3, 0.3, L)
        sz_n, le_n = evolve_exact(L, 1.0, hf, 1.1, n, theta=0.9 * np.pi,
                                  backend="native")
        sz_d, le_d = evolve_exact(L, 1.0, hf, 1.1, n, theta=0.9 * np.pi,
                                  backend="numpy")
        np.testing.assert_allclose(sz_n, sz_d, atol=1e-12)
        np.testing.assert_allclose(le_n, le_d, atol=1e-12)

    def test_norm_preserved(self):
        L = 10
        psi = np.zeros(2**L, dtype=np.complex128)
        psi[0] = 1.0
        hf = np.random.RandomState(1).uniform(-0.3, 0.3, L)
        out = native.ki_evolve_exact(psi, L, 1.0, hf, 1.0, 0.92 * np.pi, 20)
        assert abs(np.linalg.norm(out) - 1.0) < 1e-12

    def test_large_L_mps_parity(self):
        """L=14 parity of the MPS stack vs the native oracle -- a size the
        dense-unitary NumPy oracle cannot reasonably build (4^14 matrix)."""
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.dynamics.tebd import CustomFloquet
        from timecrystal_tpu.models.kicked_ising import KickedIsingModel

        L, n = 14, 8
        theta = 0.93 * np.pi
        np.random.seed(11)
        hf = np.random.uniform(-0.3, 0.3, L)
        m = KickedIsingModel(L, 1.0, 0.3, 1.0, h_fields=hf, theta=theta,
                             chi=128, dtype=jnp.float64)
        psi0 = create_initial_state(L, "neel", chi=128, dtype=jnp.float64)
        tr, _, _ = CustomFloquet(m, TruncParams(svd_min=1e-14)) \
            .evolve_floquet_traces(psi0, n)
        sz_exact, le_exact = evolve_exact(L, 1.0, hf, 1.0, n, theta=theta,
                                          backend="native")
        np.testing.assert_allclose(tr["sz_sites"], sz_exact, atol=1e-8)
        np.testing.assert_allclose(tr["loschmidt_echo"], le_exact, atol=1e-8)
