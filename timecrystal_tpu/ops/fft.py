"""On-device real-input DFT for the spectral toolkit (no complex dtypes).

The axon TPU backend implements neither complex dtypes nor an FFT, so the
reference's spectral analysis (np.fft at reference main.py:603,
observables.py:136,192,410) was host-NumPy in round 1 -- fine for a handful
of traces, but a 10^3-10^4-realization ensemble sweep should not ship every
trace to the host just to read off one subharmonic bin.

Trace lengths here are small (n_periods ~ 10^2-10^3), so the DFT is
evaluated as a dense real matmul against precomputed cos/sin matrices:
O(n^2) flops that land on the MXU and vectorize over arbitrary batch
dimensions -- far below the cost of producing the traces.  The matrices are
baked as constants per (n, dtype) program, and all ops are jit/vmap-safe
(used inside sweeps).

``batched_subharmonic_amplitude`` reproduces the host recipe of
core/observables.extract_subharmonic_amplitude (DC removal -> Hann window
-> FFT -> positive bins -> A_sub / A_max) exactly, for a whole batch in one
device call; parity vs the host implementation is regression-tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _dft_matrices_cached(n: int, dtype_name: str, k_lo: int = 0,
                         k_hi: int | None = None):
    j = np.arange(n)[:, None].astype(np.float64)
    k = np.arange(n)[None, :].astype(np.float64)[:, k_lo:(k_hi if k_hi
                                                          is not None else n)]
    ang = 2.0 * np.pi * np.mod(j * k / n, 1.0)
    return (jnp.asarray(np.cos(ang), dtype_name),
            jnp.asarray(np.sin(ang), dtype_name))


def _dft_matrices(n: int, dtype):
    """cos/sin DFT matrices [n, n]: X_k = sum_j x_j exp(-2 pi i j k / n).

    lru-cached per (n, dtype): uncompiled rdft/power_spectrum calls would
    otherwise rebuild O(n^2) host trig and re-upload 2 n^2 floats per call
    (inside jit the matrices are baked as program constants either way)."""
    return _dft_matrices_cached(int(n), jnp.dtype(dtype).name)


def rdft(x: jax.Array, axis: int = -1):
    """DFT of a real signal along ``axis``: returns (re, im) arrays of the
    same shape (full spectrum, NumPy bin order)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    cos_m, sin_m = _dft_matrices(n, x.dtype)
    re = jnp.einsum("...j,jk->...k", x, cos_m, precision="highest")
    im = -jnp.einsum("...j,jk->...k", x, sin_m, precision="highest")
    return jnp.moveaxis(re, -1, axis), jnp.moveaxis(im, -1, axis)


def power_spectrum(x: jax.Array, axis: int = -1) -> jax.Array:
    """|DFT(x)|^2 of a real signal (full spectrum, NumPy bin order)."""
    re, im = rdft(x, axis=axis)
    return re * re + im * im


@jax.jit
def _subharm_core(series: jax.Array, dt: jax.Array, period: jax.Array):
    n = series.shape[-1]
    centered = series - jnp.mean(series, axis=-1, keepdims=True)
    window = jnp.asarray(np.hanning(n), series.dtype)
    # only the positive-frequency bins of np.fft.fftfreq(n, d=dt) --
    # indices 1..(n-1)//2 -- are consumed, so the DFT panels are SLICED to
    # those columns: half the matmul flops and half the baked-constant
    # footprint of the full rdft
    n_pos = (n - 1) // 2
    cos_m, sin_m = _dft_matrices_cached(int(n), jnp.dtype(series.dtype).name,
                                        1, n_pos + 1)
    xw = centered * window
    re = jnp.einsum("...j,jk->...k", xw, cos_m, precision="highest")
    im = -jnp.einsum("...j,jk->...k", xw, sin_m, precision="highest")
    amp_pos = jnp.sqrt(re * re + im * im)                 # |FFT| amplitudes
    idx = jnp.arange(1, n_pos + 1)
    freqs_pos = idx.astype(series.dtype) / (n * dt[..., None])  # [..., n_pos]
    sub_f = (1.0 / period) / 2.0
    sub_idx = jnp.argmin(jnp.abs(freqs_pos - sub_f[..., None]), axis=-1)
    amp = jnp.take_along_axis(amp_pos, sub_idx[..., None], axis=-1)[..., 0]
    max_amp = jnp.max(amp_pos, axis=-1)
    return jnp.where(max_amp > 1e-12, amp / jnp.maximum(max_amp, 1e-12), 0.0)


def batched_subharmonic_amplitude(times: jax.Array, series: jax.Array,
                                  drive_period) -> jax.Array:
    """A2T for a batch of traces, entirely on device.

    Args:
      times:  [n] or [..., n] sample times (uniform grid assumed, as the
              host recipe does via mean(diff)).
      series: [..., n] real traces.
      drive_period: scalar or [...] drive period(s).

    Returns [...] normalized subharmonic amplitudes, matching
    core/observables.extract_subharmonic_amplitude bin-for-bin.
    """
    times = jnp.asarray(times)
    series = jnp.asarray(series)
    if series.shape[-1] < 10:
        # host-recipe guard (observables.extract_subharmonic_amplitude):
        # traces shorter than 10 samples score 0.0 -- without this, tiny
        # n returns spurious A2T = 1.0 and n <= 2 crashes on empty bins
        return jnp.zeros(series.shape[:-1], series.dtype)
    if times.ndim == 1:
        dt = jnp.mean(jnp.diff(times))
    else:
        dt = jnp.mean(jnp.diff(times, axis=-1), axis=-1)
    period = jnp.asarray(drive_period, series.dtype)
    period = jnp.broadcast_to(period, series.shape[:-1])
    dt = jnp.broadcast_to(jnp.asarray(dt, series.dtype), series.shape[:-1])
    out = _subharm_core(series, dt, period)
    # Non-finite traces: the host recipe computes A2T of the FINITE subset
    # (a dynamic shape no fixed-shape device program can express).  A NaN
    # poisons the DFT and used to fall out as a silent 0.0 -- a false
    # 'no time crystal'.  Return NaN instead so the divergence is VISIBLE;
    # callers needing the host semantics (ensemble_a2t) recompute those
    # realizations host-side.  The guard covers the TIME grid too: a
    # non-finite time or dt <= 0 (duplicate timestamps) would otherwise
    # make the all-NaN/inf bin argmin return an arbitrary plausible bin.
    finite = (jnp.all(jnp.isfinite(series), axis=-1)
              & jnp.isfinite(dt) & (dt > 0))
    return jnp.where(finite, out, jnp.nan)


def spacetime_power(c_rt: jax.Array, window_time: bool = True,
                    remove_dc: bool = True) -> jax.Array:
    """|DFT_{t -> omega, r -> k} C|^2 of a real space-time map, on device.

    The 2D DFT is two chained matmul DFT panels (time axis first, then the
    space axis on the complex intermediate via real-pair arithmetic -- the
    axon backend has no complex dtypes).  Only the positive-frequency time
    bins 1..(n_t-1)//2 are produced (the real-input spectrum is conjugate
    symmetric; the sliced panels halve the matmul flops exactly as
    ``_subharm_core`` does); all L momentum bins are kept (the spatial
    signal is complex after the time DFT, so k and -k are independent).

    Args:
      c_rt: [..., n_t, L] real map, e.g. traces["zz_corr"] from
        evolve_floquet_scan(correlation_site=i).
      window_time: apply a Hann window along time (the spectral-toolkit
        convention; reference main.py:598-603 recipe).
      remove_dc: subtract the per-r time mean first (isolates the dynamic
        response; the static AF order otherwise swamps the omega > 0 bins).

    Returns [..., n_pos, L] power with n_pos = (n_t - 1) // 2; time bin f
    (1-indexed) is frequency f / (n_t * dt), momentum bin m is
    k = 2 pi m / L.
    """
    c_rt = jnp.asarray(c_rt)
    n_t, L = c_rt.shape[-2], c_rt.shape[-1]
    x = c_rt
    if remove_dc:
        x = x - jnp.mean(x, axis=-2, keepdims=True)
    if window_time:
        x = x * jnp.asarray(np.hanning(n_t), x.dtype)[..., :, None]
    n_pos = (n_t - 1) // 2
    cos_t, sin_t = _dft_matrices_cached(int(n_t), jnp.dtype(x.dtype).name,
                                        1, n_pos + 1)
    # time DFT: contract the n_t axis -> [..., n_pos, L]
    re = jnp.einsum("...tr,tf->...fr", x, cos_t, precision="highest")
    im = -jnp.einsum("...tr,tf->...fr", x, sin_t, precision="highest")
    # space DFT of the complex intermediate: (re + i im)(cos - i sin)
    cos_r, sin_r = _dft_matrices(L, x.dtype)
    re2 = (jnp.einsum("...fr,rk->...fk", re, cos_r, precision="highest")
           + jnp.einsum("...fr,rk->...fk", im, sin_r, precision="highest"))
    im2 = (jnp.einsum("...fr,rk->...fk", im, cos_r, precision="highest")
           - jnp.einsum("...fr,rk->...fk", re, sin_r, precision="highest"))
    return re2 * re2 + im2 * im2
