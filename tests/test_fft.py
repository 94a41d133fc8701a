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


class TestSpacetimePower:
    """Space-time power map (ops/fft.spacetime_power) and the
    dynamic_structure_factor wrapper."""

    def test_matches_numpy_fft2(self):
        """Bin-exact vs the NumPy 2D FFT of the identically preprocessed
        map (Hann in time, per-r time-mean removed), positive time bins."""
        from timecrystal_tpu.ops.fft import spacetime_power

        rng = np.random.default_rng(7)
        n_t, L = 41, 12
        c = rng.normal(size=(n_t, L))
        S = np.asarray(spacetime_power(jnp.asarray(c)))
        x = c - c.mean(axis=0, keepdims=True)
        x = x * np.hanning(n_t)[:, None]
        F = np.fft.fft2(x)                      # axes (t, r), NumPy order
        n_pos = (n_t - 1) // 2
        np.testing.assert_allclose(S, np.abs(F[1:n_pos + 1, :]) ** 2,
                                   rtol=1e-10, atol=1e-12)

    def test_batch_dims(self):
        from timecrystal_tpu.ops.fft import spacetime_power

        rng = np.random.default_rng(8)
        c = rng.normal(size=(3, 21, 8))
        S = np.asarray(spacetime_power(jnp.asarray(c)))
        assert S.shape == (3, 10, 8)
        S0 = np.asarray(spacetime_power(jnp.asarray(c[1])))
        np.testing.assert_allclose(S[1], S0, rtol=1e-12)

    def test_synthetic_dtc_peak(self):
        """A period-doubled antiferromagnetic map cos(pi r) cos(omega t/2)
        must put the spectral peak at exactly (k = pi, f = f_drive/2).

        Sampled at dt = T/4 with n_t = 128 so the subharmonic f = 1/(2T)
        sits EXACTLY on time bin 16 (stroboscopic dt = T sampling would
        put it at Nyquist, outside the positive-bin slice)."""
        from timecrystal_tpu.core.observables import dynamic_structure_factor

        L, T, n_t = 16, 2.0, 128
        times = np.arange(n_t) * (T / 4)
        r = np.arange(L)
        c = np.cos(np.pi * r)[None, :] * np.cos(
            2 * np.pi * times / (2 * T))[:, None]
        freqs, ks, S = dynamic_structure_factor(times, c)
        S = np.asarray(S)
        fi, ki = np.unravel_index(np.argmax(S), S.shape)
        assert ks[ki] == 2 * np.pi * (L // 2) / L      # k = pi
        f_drive = 1.0 / T
        assert abs(freqs[fi] - f_drive / 2) < 1e-12

    def test_kicked_ising_subharmonic_peak(self):
        """End-to-end: the TWO-TIME map C(r, t) = <sz_i(0) sz_j(t)> of a
        disordered kicked-Ising chain in the DTC regime -> S(k, omega)
        peaks at (k = pi, f -> f_drive/2).  The two-time map is the
        correct input here: the equal-time map is nearly static in a DTC
        (both spins flip together), while the two-time map alternates
        with O(1) amplitude."""
        from timecrystal_tpu.core.mps import create_initial_state
        from timecrystal_tpu.core.observables import dynamic_structure_factor
        from timecrystal_tpu.core.truncate import TruncParams
        from timecrystal_tpu.dynamics.tebd import evolve_two_time_zz
        from timecrystal_tpu.models.kicked_ising import (
            draw_disorder_reference, make_floquet_gates)

        L, tau, n_per = 12, 1.0, 40
        h = draw_disorder_reference(L, 0.2, 42)
        gates = make_floquet_gates(1.0, jnp.asarray(h, jnp.float64), tau,
                                   theta=0.98 * np.pi, dtype=jnp.float64)
        tp = TruncParams(chi_max=0, svd_min=1e-12)
        psi = create_initial_state(L, "neel", chi=32, dtype=jnp.float64)
        _, tr = evolve_two_time_zz(psi, gates, n_per, tp, anchor=L // 2)
        # scan traces have no t=0 row: rows are t = 2 tau ... n_per * 2 tau
        times = (np.arange(n_per) + 1) * 2 * tau
        freqs, ks, S = dynamic_structure_factor(times, tr["zz2t_re"])
        S = np.asarray(S)
        fi, ki = np.unravel_index(np.argmax(S), S.shape)
        assert ks[ki] == np.pi, (ki, ks[ki])
        # stroboscopic sampling (dt = T): the subharmonic f = 1/(2T) IS
        # the Nyquist frequency, so the peak must land on the positive
        # bin closest to it
        f_sub = 1.0 / (4 * tau)
        assert fi == int(np.argmin(np.abs(freqs - f_sub))), (
            fi, freqs[fi], f_sub)
        # and the peak carries O(1) of the total spectral weight
        assert S[fi, ki] > 0.5 * np.sum(S) / 10
