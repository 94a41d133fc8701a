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

    def test_short_series_guard(self):
        """Traces < 10 samples score 0.0 like the host recipe (used to
        return a spurious 1.0 at n=3 and crash on empty bins at n<=2)."""
        for n in (2, 3, 9):
            times = np.arange(n) * 2.0
            series = np.cos(np.pi * np.arange(n))
            out = np.asarray(batched_subharmonic_amplitude(
                jnp.asarray(times), jnp.asarray(series[None]), 4.0))
            host = extract_subharmonic_amplitude(times, series, 4.0)
            np.testing.assert_allclose(out, [host])
            np.testing.assert_allclose(out, [0.0])

    def test_nonfinite_trace_returns_nan(self):
        """A NaN sample must surface as NaN (the silent 0.0 read as a
        false 'no time crystal'); ensemble_a2t recomputes such traces
        host-side with the reference's finite-subset recipe."""
        n = 60
        times = np.arange(n) * 2.0
        good = np.cos(np.pi * np.arange(n))
        bad = good.copy()
        bad[30] = np.nan
        out = np.asarray(batched_subharmonic_amplitude(
            jnp.asarray(times), jnp.asarray(np.stack([good, bad])), 4.0))
        assert np.isfinite(out[0])
        assert np.isnan(out[1])

    def test_ensemble_a2t_nonfinite_falls_back_to_host(self):
        from timecrystal_tpu.parallel.sweep import ensemble_a2t
        n = 60
        good = np.cos(np.pi * np.arange(n + 1))
        bad = good.copy()
        bad[30] = np.nan
        traces = {"staggered_magnetization": np.stack([good, bad])}
        taus = np.array([2.0, 2.0])
        out = np.asarray(ensemble_a2t(traces, taus))
        times = np.arange(n + 1) * 4.0
        host_bad = extract_subharmonic_amplitude(times, bad, 4.0)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[1], host_bad, atol=1e-7)

    def test_per_trace_drive_periods(self):
        n = 120
        times = np.arange(n) * 1.0
        periods = np.array([2.0, 4.0])
        batch = np.stack([np.cos(2 * np.pi * times / (2 * p))
                          for p in periods])
        out = np.asarray(batched_subharmonic_amplitude(
            jnp.asarray(times), jnp.asarray(batch), jnp.asarray(periods)))
        assert np.all(out > 0.8)
