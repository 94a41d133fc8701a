"""On-device DFT tier: matmul-DFT parity vs NumPy FFT and the host
spectral recipe (ops/fft.py)."""

import jax.numpy as jnp
import numpy as np

from timecrystal_tpu.core.observables import extract_subharmonic_amplitude
from timecrystal_tpu.ops.fft import (batched_subharmonic_amplitude,
                                     power_spectrum, rdft)


class TestRDFT:
    def test_matches_numpy_fft(self):
        rng = np.random.RandomState(0)
        for n in (16, 80, 201, 256):
            x = rng.randn(3, n)
            re, im = rdft(jnp.asarray(x))
            ref = np.fft.fft(x)
            err = np.max(np.abs(np.asarray(re) + 1j * np.asarray(im) - ref))
            assert err < 1e-10 * max(1.0, np.abs(ref).max()), (n, err)

    def test_axis_argument(self):
        rng = np.random.RandomState(1)
        x = rng.randn(5, 64, 2)
        re, im = rdft(jnp.asarray(x), axis=1)
        ref = np.fft.fft(x, axis=1)
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-10)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-10)

    def test_power_spectrum(self):
        rng = np.random.RandomState(2)
        x = rng.randn(4, 128)
        p = np.asarray(power_spectrum(jnp.asarray(x)))
        np.testing.assert_allclose(p, np.abs(np.fft.fft(x)) ** 2,
                                   rtol=1e-10, atol=1e-10)


class TestBatchedSubharmonic:
    def test_matches_host_recipe(self):
        rng = np.random.RandomState(3)
        n = 81
        times = np.arange(n) * 2.0
        batch = np.stack([
            np.cos(np.pi * np.arange(n)) * np.exp(-0.002 * np.arange(n)),
            np.cos(0.5 * np.pi * np.arange(n)),
            rng.randn(n),
            np.zeros(n),
        ])
        dev = np.asarray(batched_subharmonic_amplitude(
            jnp.asarray(times), jnp.asarray(batch), 4.0))
        host = np.array([extract_subharmonic_amplitude(times, b, 4.0)
                         for b in batch])
        np.testing.assert_allclose(dev, host, atol=1e-10)

    def test_pure_subharmonic_signal_scores_high(self):
        n = 200
        times = np.arange(n) * 2.0
        period = 4.0
        sub = np.cos(2 * np.pi * times / (2 * period))   # omega/2 line
        a = float(batched_subharmonic_amplitude(jnp.asarray(times),
                                                jnp.asarray(sub[None]),
                                                period)[0])
        assert a > 0.8

    def test_per_trace_drive_periods(self):
        n = 120
        times = np.arange(n) * 1.0
        periods = np.array([2.0, 4.0])
        batch = np.stack([np.cos(2 * np.pi * times / (2 * p))
                          for p in periods])
        out = np.asarray(batched_subharmonic_amplitude(
            jnp.asarray(times), jnp.asarray(batch), jnp.asarray(periods)))
        assert np.all(out > 0.8)
