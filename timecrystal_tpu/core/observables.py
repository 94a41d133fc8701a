"""Observables for quantum many-body states.

Pure-function ports of the reference's observable semantics
(src/core/observables.py) redesigned for TPU:
  * per-site expectations are ONE batched contraction over all sites (the
    reference rebuilds a TeNPy operator tensor per site per call,
    observables.py:50-58 -- quadratic-ish in practice, SURVEY.md 3.2),
  * the Loschmidt echo is a jit ``lax.scan`` transfer contraction,
  * complex arithmetic is real-pair math (ops/cpx.py; no complex dtypes on
    the TPU backend).

The spectral toolkit (FFT post-processing of observable *traces*) runs
host-side in NumPy: traces are tiny (O(n_periods) scalars) and the division
of labor -- evolution on device, detection on host -- avoids shipping
complex FFT outputs through a backend without complex support.

Conventions preserved exactly: Pauli (+-1) magnetizations (not S=1/2),
staggered magnetization normalized by 1/L (observables.py:369).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.cpx import C
from . import gates as G
from .mps import MPS, entanglement_entropy, entanglement_spectrum  # noqa: F401 (re-export)
from .mps import expectation_one_site, overlap


def calculate_loschmidt_echo(psi_initial: MPS, psi_evolved: MPS) -> jax.Array:
    """L(t) = |<psi0|psi(t)>|^2  (reference observables.py:11-26)."""
    return cpx.abs2(overlap(psi_initial, psi_evolved))


def sz_sites(psi: MPS) -> jax.Array:
    """<sigma_z_i> for every site, [L] real -- the workhorse observable."""
    return expectation_one_site(psi, G.pauli_c("z", psi.dtype)).re


def magnetization(psi: MPS, direction: str = "z", site: int | None = None):
    """Magnetization along x/y/z; total over sites or a single site.

    Reference observables.py:29-71 -- values are Pauli expectations in
    [-1, 1] per site; 'total' sums them (range [-L, L])."""
    vals = expectation_one_site(psi, G.pauli_c(direction, psi.dtype)).re
    if site is not None:
        return vals[site]
    return jnp.sum(vals)


def calculate_magnetization(psi: MPS, direction: str = "z"):
    """Alias (reference observables.py:224-235)."""
    return magnetization(psi, direction)


def add_derived_magnetization(traces: dict, L: int) -> dict:
    """In place: derive ``magnetization`` (UNnormalized site sum) and
    ``staggered_magnetization`` ((1/L)-normalized alternating sum,
    reference observables.py:350-369) from ``sz_sites [..., L]``.

    THE single host-side home of the sign/normalization convention --
    every trace-assembling driver (tebd, sweep, open_system) derives
    through here so the convention cannot drift between paths."""
    sz = np.asarray(traces["sz_sites"])
    signs = np.where(np.arange(L) % 2 == 0, 1.0, -1.0)
    traces["magnetization"] = sz.sum(axis=-1)
    traces["staggered_magnetization"] = (sz * signs).sum(axis=-1) / L
    return traces


def staggered_signs(L: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(np.where(np.arange(L) % 2 == 0, 1.0, -1.0), dtype=dtype)


def staggered_magnetization(psi: MPS) -> jax.Array:
    """M_s = (1/L) sum_i (-1)^i <sigma_i^z>  (reference observables.py:350-369)."""
    vals = sz_sites(psi)
    L = vals.shape[0]
    return jnp.sum(staggered_signs(L, vals.dtype) * vals) / L


def correlation_function(psi: MPS, op1: str, op2: str, i: int, j: int) -> C:
    """Two-point correlator <sigma_i^op1 sigma_j^op2> (observables.py:74-121).

    Same-site case multiplies the operators; distinct sites contract the
    transfer matrix between i and j with the B-form environments.  Returns
    a C scalar.

    NOTE: the transfer steps unroll O(|i - j|) in Python (i, j are
    static), so tracing this over MANY pairs compiles quadratically in L.
    For zz correlations from one anchor use ``zz_correlation_profile``
    instead -- the whole [L] profile in two O(L) scans, cheap enough to
    run in-scan per period; this per-pair form exists for reference API
    parity and arbitrary (op1, op2) figure use.
    """
    o1 = G.pauli_c(op1, psi.dtype)
    o2 = G.pauli_c(op2, psi.dtype)
    if i == j:
        return expectation_one_site(psi, cpx.matmul(o1, o2))[i]
    if i > j:
        i, j, o1, o2 = j, i, o2, o1
    w = psi.lam[i] ** 2  # left environment at site i
    Bi = psi.B[i]
    T = cpx.einsum("pq,aqc->apc", o1, Bi)
    E = cpx.einsum("apb,apc->bc", Bi.conj(), T * w[:, None, None])
    for k in range(i + 1, j):  # static unroll; shapes fixed
        Bk = psi.B[k]
        T = cpx.einsum("ab,bpc->apc", E, Bk)
        E = cpx.einsum("apb,apc->bc", Bk.conj(), T)
    Bj = psi.B[j]
    T = cpx.einsum("pq,bqc->bpc", o2, Bj)
    T = cpx.einsum("ab,bpc->apc", E, T)
    return cpx.einsum("apc,apc->", Bj.conj(), T)


def zz_correlation_profile(psi: MPS, i: int) -> jax.Array:
    """<sigma^z_i sigma^z_j> for ALL j in two transfer scans: [L] real.

    The reference computes correlators per (i, j) pair from materialized
    state histories (observables.py:74-121 applied per stored state); this
    is the TPU-native form: with z diagonal and the MPS right-canonical,
    the whole profile from one anchor site costs one forward and one
    backward O(L chi^3) lax.scan -- cheap enough to run IN-SCAN per
    measurement (dynamics.tebd.evolve_floquet_scan(correlation_site=i)),
    yielding C(r, t) maps with no state materialization.

    Entry j == i is <z_i z_i> = <I> = 1 exactly.  ``i`` is static.
    """
    L, chi, d, _ = psi.B.re.shape
    z = G.pauli_c("z", psi.dtype)
    zdiag = z.re.diagonal()                       # z is diagonal real
    w_i = psi.lam[i] ** 2

    Bi = psi.B[i]
    # E[a, b]: sites <= i contracted with z inserted at i (left env
    # diag(lam_i^2); right of the insertion stays open)
    Tz = Bi * zdiag[None, :, None]
    E0 = cpx.einsum("apb,apc->bc", Bi.conj(), Tz * w_i[:, None, None])

    def fwd(E, Bj):
        # readout BEFORE absorbing: right-canonicity collapses sites > j
        Tj = Bj * zdiag[None, :, None]
        T = cpx.einsum("bc,cpa->bpa", E, Tj)
        corr = cpx.einsum("bpa,bpa->", Bj.conj(), T).re
        T = cpx.einsum("ab,bpc->apc", E, Bj)
        E = cpx.einsum("apb,apc->bc", Bj.conj(), T)
        return E, corr

    _, corr_fwd = jax.lax.scan(fwd, E0, psi.B[i + 1:])      # j = i+1 .. L-1

    # F[c, c']: sites >= i contracted with z inserted at i (right-collapsed)
    F0 = cpx.einsum("apc,bpc->ab", Tz, Bi.conj())

    def bwd(F, xs):
        Bj, wj = xs
        Tj = Bj * zdiag[None, :, None]
        T = cpx.einsum("apc,cd->apd", Tj * wj[:, None, None], F)
        corr = cpx.einsum("apd,apd->", T, Bj.conj()).re
        T = cpx.einsum("apc,cd->apd", Bj, F)
        F = cpx.einsum("apd,bpd->ab", T, Bj.conj())
        return F, corr

    _, corr_bwd = jax.lax.scan(bwd, F0, (psi.B[:i][::-1],
                                         (psi.lam[:i] ** 2)[::-1]))
    out = jnp.concatenate([corr_bwd[::-1], jnp.ones((1,), corr_bwd.dtype),
                           corr_fwd])
    return out


def cross_sz_profile(phi: MPS, psi: MPS) -> C:
    """<phi| sigma^z_j |psi> for ALL j: C array [L].

    The cross-state counterpart of ``zz_correlation_profile``: with
    phi(t) = U^t sigma^z_i |psi0> and psi(t) = U^t |psi0| this reads off
    the TWO-TIME correlator C(r, t) = <sz_i(0) sz_j(t)> -- the standard
    DTC order-parameter diagnostic (the equal-time map is nearly static
    in a time crystal: both spins flip together, so its subharmonic
    weight is only O(pulse imperfection); the two-time map alternates at
    f_drive/2 with O(1) amplitude).

    No canonical collapse applies on either side (the two states differ),
    so this is three O(L chi^3) passes: left transfer environments, right
    transfer environments (both ``lax.scan``), one batched per-site
    readout.  Boundary convention matches ``core.mps.overlap``.
    """
    dtype = psi.dtype
    zdiag = G.pauli_c("z", dtype).re.diagonal()
    chi1, chi2 = phi.B.re.shape[1], psi.B.re.shape[1]

    E0 = C(jnp.zeros((chi1, chi2), dtype).at[0, 0].set(1.0),
           jnp.zeros((chi1, chi2), dtype))

    def lstep(E, Bs):
        B1, B2 = Bs
        T = cpx.einsum("ab,bpc->apc", E, B2)
        return cpx.einsum("apb,apc->bc", B1.conj(), T), E

    _, Ls = jax.lax.scan(lstep, E0, (phi.B, psi.B))   # Ls[j] = env of sites < j

    def rstep(R, Bs):
        B1, B2 = Bs
        T = cpx.einsum("apb,cb->apc", B2, R)
        return cpx.einsum("apc,bpc->ab", B1.conj(), T), R

    _, Rs = jax.lax.scan(rstep, E0, (phi.B[::-1], psi.B[::-1]))
    Rs = Rs[::-1]                                     # Rs[j] = env of sites > j

    Bz = psi.B * zdiag[None, None, :, None]
    T1 = cpx.einsum("jab,jbpc->japc", Ls, Bz)
    T2 = cpx.einsum("japc,jbc->japb", T1, Rs)
    return cpx.einsum("japb,japb->j", phi.B.conj(), T2)


def bond_energies(psi: MPS, bond_H: C) -> jax.Array:
    """Per-bond energies <theta_b| H_b |theta_b> / <theta_b|theta_b>: [L-1].

    ``bond_H`` is C[L-1, d, d, d, d] with the gate index convention
    [p_out, q_out, p_in, q_in] (core/truncate.apply_bond_gates).  With
    onsite terms split onto bonds (dynamics.tebd.spin_chain_model) the sum
    is the full energy <H>.  All bonds are contracted in ONE batched
    einsum over the bond axis (theta_b = lam_b . B_b . B_{b+1}; right
    environments are trivial in B-form, the left environment is
    diag(lam^2)).  The per-bond normalization makes the value robust to
    the O(dt) canonical-form drift of imaginary-time TEBD
    (dynamics/ground_state.py).  The reference has no energy observable
    at all (its README advertises ground-state preparation that the code
    never implements); this supports the TPU-native one.
    """
    L = psi.L
    Bl = psi.B[:-1]                       # C[L-1, chi, d, chi]
    Br = psi.B[1:]
    lamL = psi.lam[: L - 1]               # [L-1, chi]
    theta = cpx.einsum("napb,nbqc->napqc", Bl, Br) * lamL[:, :, None, None, None]
    Ht = cpx.einsum("npqrs,narsc->napqc", bond_H, theta)
    num = cpx.einsum("napqc,napqc->n", theta.conj(), Ht).re
    den = cpx.einsum("napqc,napqc->n", theta.conj(), theta).re
    return num / jnp.maximum(den, jnp.asarray(1e-30, den.dtype))


def total_energy(psi: MPS, bond_H: C) -> jax.Array:
    """<H> for a nearest-neighbor chain Hamiltonian (sum of bond_energies)."""
    return jnp.sum(bond_energies(psi, bond_H))


def bond_energies_exact(psi: MPS, bond_H: C) -> jax.Array:
    """Per-bond energies with EXACT left/right environments: [L-1].

    ``bond_energies`` assumes canonical form (left env diag(lam^2), right
    env identity), which non-unitary imaginary-time sweeps degrade at
    O(dt) -- flooring the measured energy error at O(dt) even though the
    state itself is O(dt^2) from the ground state.  This variant builds
    both environment stacks by genuine transfer contractions (two
    O(L chi^3) ``lax.scan``s, same recurrence as ``core.mps.overlap``),
    so the result is the true variational Rayleigh quotient
    <psi|H_b|psi> / <psi|psi> regardless of canonical-form drift: energy
    error quadratic in the state error.  Used by
    dynamics/ground_state.imaginary_time_scan.
    """
    L, chi = psi.L, psi.chi
    dtype = psi.dtype
    e00 = C(jnp.zeros((chi, chi), dtype).at[0, 0].set(1.0),
            jnp.zeros((chi, chi), dtype))

    def fwd(E, B):
        # E[a_bra, a_ket]; emit the env BEFORE absorbing this site
        T = cpx.einsum("ab,bpc->apc", E, B)
        E_new = cpx.einsum("apb,apc->bc", B.conj(), T)
        return E_new, E

    _, lenvs = jax.lax.scan(fwd, e00, psi.B)      # lenvs[i]: left of site i

    def bwd(F, B):
        # F[b_bra, b_ket]; emit the env RIGHT of this site before absorbing
        T = cpx.einsum("apb,bc->apc", B.conj(), F)
        F_new = cpx.einsum("apc,dpc->ad", T, B)
        return F_new, F

    _, renvs = jax.lax.scan(bwd, e00, psi.B, reverse=True)  # renvs[i]: right of site i

    Bl, Br = psi.B[:-1], psi.B[1:]
    theta = cpx.einsum("napb,nbqc->napqc", Bl, Br)          # C[L-1,chi,d,d,chi]
    Ht = cpx.einsum("npqrs,narsc->napqc", bond_H, theta)
    lenv = lenvs[:-1]                                       # env left of site b
    renv = renvs[1:]                                        # env right of site b+1

    def sandwich(mid):
        # <theta| lenv (x) mid (x) renv: lenv[a_bra, A_ket], renv[c_bra, C_ket]
        T1 = cpx.einsum("naA,nApqC->napqC", lenv, mid)
        T2 = cpx.einsum("napqC,ncC->napqc", T1, renv)
        return cpx.einsum("napqc,napqc->n", theta.conj(), T2).re

    num = sandwich(Ht)
    den = sandwich(theta)
    return num / jnp.maximum(den, jnp.asarray(1e-30, den.dtype))


def order_parameter(psi: MPS, sublattice_a, sublattice_b) -> jax.Array:
    """|<S_A> - <S_B>| over z-magnetization sublattice means
    (reference observables.py:280-296)."""
    vals = sz_sites(psi)
    a = jnp.mean(vals[jnp.asarray(sublattice_a)])
    b = jnp.mean(vals[jnp.asarray(sublattice_b)])
    return jnp.abs(a - b)


def participation_ratio(psi: MPS) -> jax.Array:
    """Participation ratio over local densities (observables.py:299-347).

    The reference sums prob_up + prob_down per site (identically 1 for a
    normalized state); semantics preserved."""
    up = cpx.from_numpy(np.array([[1, 0], [0, 0]]), psi.dtype)
    dn = cpx.from_numpy(np.array([[0, 0], [0, 1]]), psi.dtype)
    dens = expectation_one_site(psi, up).re + expectation_one_site(psi, dn).re
    num = jnp.sum(dens) ** 2
    den = jnp.sum(dens**2)
    return jnp.where(den > 0, num / den, 0.0)


# ---------------------------------------------------------------------------
# Spectral toolkit (4 variants, SURVEY.md component 4) -- host-side NumPy
# ---------------------------------------------------------------------------

def fidelity_decay(loschmidt_echoes, times) -> float:
    """Coherence time T2 from a linear fit of log L(t)
    (reference observables.py:254-277)."""
    le = np.asarray(loschmidt_echoes, dtype=float)
    t = np.asarray(times, dtype=float)
    logf = np.log(np.maximum(le, 1e-10))
    coeffs = np.polyfit(t, logf, 1)
    decay_rate = -coeffs[0]
    return float(1.0 / decay_rate) if decay_rate > 0 else np.inf


def subharmonic_response(magnetization_data, drive_period):
    """(fundamental_amplitude, subharmonic_amplitude) from a raw FFT
    (reference observables.py:124-150; no window, raw bins, unit-spacing
    fftfreq -- semantics preserved exactly)."""
    m = np.asarray(magnetization_data, dtype=float)
    fft_data = np.fft.fft(m)
    freqs = np.fft.fftfreq(len(m))
    fundamental_freq = 1.0 / drive_period
    subharmonic_freq = fundamental_freq / 2.0
    fund_idx = int(np.argmin(np.abs(freqs - fundamental_freq)))
    sub_idx = int(np.argmin(np.abs(freqs - subharmonic_freq)))
    return abs(fft_data[fund_idx]), abs(fft_data[sub_idx])


def _windowed_fft(series: np.ndarray, dt: float):
    """DC removal -> Hann window -> FFT -> positive-frequency half
    (the reference's recipe, observables.py:184-198)."""
    centered = series - np.mean(series)
    window = np.hanning(len(centered))
    fft_result = np.fft.fft(centered * window)
    freqs = np.fft.fftfreq(len(centered), d=dt)
    pos = freqs > 0
    return freqs[pos], fft_result[pos]


def extract_subharmonic_amplitude(times, magnetizations, period) -> float:
    """Normalized subharmonic amplitude A2T (reference observables.py:153-221)."""
    t = np.asarray(times, dtype=float)
    m = np.asarray(magnetizations, dtype=float)
    if len(t) < 10 or len(m) < 10:
        return 0.0
    valid = np.isfinite(m) & np.isfinite(t)
    if np.sum(valid) < 10:
        return 0.0
    t, m = t[valid], m[valid]
    dt = float(np.mean(np.diff(t)))
    if dt <= 0:
        return 0.0
    freqs_pos, fft_pos = _windowed_fft(m, dt)
    if len(freqs_pos) == 0:
        return 0.0
    subharmonic_freq = (1.0 / period) / 2.0
    sub_idx = int(np.argmin(np.abs(freqs_pos - subharmonic_freq)))
    amp = np.abs(fft_pos[sub_idx])
    max_amp = np.max(np.abs(fft_pos))
    return float(amp / max_amp) if max_amp > 1e-12 else 0.0


def subharmonic_weight_fraction(times, magnetizations, period) -> float:
    """Subharmonic fraction of TOTAL spectral weight: the omega/2 Hann
    main lobe's power over sum|F|^2.

    The non-saturating companion of ``extract_subharmonic_amplitude``:
    A2T normalizes by the MAX bin, so it plateaus at exactly 1.0 over the
    whole region where the omega/2 bin still dominates (the drive-strength
    melting diagram is flat until eps ~ 0.4 at L=16/80 periods --
    analysis/phase_diagram.generate_drive_diagram note).  Normalizing by
    the total power instead keeps gradient on BOTH sides of the melting
    boundary: a perfect period-doubled response concentrates ~all weight
    in one bin (fraction near 1 up to window leakage), and any transfer of
    weight to other frequencies lowers it continuously.  Same windowed-FFT
    recipe and validity guards as the reference-parity A2T.
    """
    t = np.asarray(times, dtype=float)
    m = np.asarray(magnetizations, dtype=float)
    if len(t) < 10 or len(m) < 10:
        return 0.0
    valid = np.isfinite(m) & np.isfinite(t)
    if np.sum(valid) < 10:
        return 0.0
    t, m = t[valid], m[valid]
    dt = float(np.mean(np.diff(t)))
    if dt <= 0:
        return 0.0
    freqs_pos, fft_pos = _windowed_fft(m, dt)
    if len(freqs_pos) == 0:
        return 0.0
    power = np.abs(fft_pos) ** 2
    total = float(np.sum(power))
    if total <= 1e-24:
        return 0.0
    sub_idx = int(np.argmin(np.abs(freqs_pos - (1.0 / period) / 2.0)))
    # sum the Hann main lobe (bin +-1): the window puts only ~2/3 of a
    # pure tone's power in its center bin (coefficients 0.5/0.25/0.25),
    # so the single-bin fraction would cap at 0.66 even for a perfect DTC
    lo, hi = max(sub_idx - 1, 0), min(sub_idx + 2, len(power))
    return float(np.sum(power[lo:hi]) / total)


def extract_subharmonic_amplitude_from_loschmidt(times, loschmidt_echoes, period) -> float:
    """Same recipe applied to the Loschmidt echo (observables.py:372-439)."""
    return extract_subharmonic_amplitude(times, loschmidt_echoes, period)


def detect_period_doubling_from_loschmidt(loschmidt_echoes, tolerance: float = 0.1) -> float:
    """Alternating-pattern strength of the LE series (observables.py:442-488)."""
    le = np.asarray(loschmidt_echoes, dtype=float)
    if len(le) < 4:
        return 0.0
    even, odd = le[0::2], le[1::2]
    if len(even) < 2 or len(odd) < 2:
        return 0.0
    even_std, odd_std = np.std(even), np.std(odd)
    even_mean, odd_mean = np.mean(even), np.mean(odd)
    separation = abs(even_mean - odd_mean)
    max_sep = max(even_mean, odd_mean)
    if max_sep <= 0:
        return 0.0
    strength = separation / max_sep
    consistency_penalty = min(even_std, odd_std) / (separation + 1e-10)
    strength *= np.exp(-consistency_penalty)
    return float(min(strength, 1.0))


def calculate_fourier_spectrum(times, data, drive_period):
    """Normalized power spectrum vs omega/omega_drive (reference main.py:571-618).

    Returns (freqs_normalized, power_normalized) over positive frequencies.
    """
    t = np.asarray(times, dtype=float)
    x = np.asarray(data, dtype=float)
    dt = float(np.mean(np.diff(t)))
    freqs_pos, fft_pos = _windowed_fft(x, dt)
    power = np.abs(fft_pos) ** 2
    drive_freq = 1.0 / drive_period
    pmax = np.max(power) if len(power) else 0.0
    return freqs_pos / drive_freq, (power / pmax if pmax > 0 else power)


def dynamic_structure_factor(times, c_rt):
    """S(k, omega) from a C(r, t) correlator map: (freqs, ks, S).

    Space-time power spectrum of a correlator map -- the momentum-resolved
    counterpart of the reference's site-series Fourier toolkit (reference
    main.py:571-618 works one real-space series at a time; a structure
    factor requires the state histories it materializes, here it is one
    device program on an in-scan map).

    Input choice matters for the DTC signature.  The TWO-TIME map
    ``zz2t_re`` from ``dynamics.tebd.evolve_two_time_zz`` (C(r, t) =
    Re <sz_i(0) sz_j(t)>) peaks at (k = pi, f = 1/(2 T_drive)) with O(1)
    weight -- the standard period-doubling diagnostic.  The EQUAL-TIME
    map (``correlation_site=...`` traces) is nearly static in a DTC (both
    spins flip together): it reads out the k = pi antiferromagnetic order
    and its decay envelope, with only O(pulse-imperfection) subharmonic
    weight.

    Args:
      times: [n_t] uniform sample times of the map's rows.
      c_rt:  [..., n_t, L] real correlator map (batch dims allowed).

    Returns:
      freqs: [n_pos] positive frequencies (same binning as
        ``extract_subharmonic_amplitude``), n_pos = (n_t - 1) // 2.
      ks:    [L] momenta 2 pi m / L, m = 0..L-1.
      S:     [..., n_pos, L] real power, Hann-windowed and DC-removed
        along time (ops.fft.spacetime_power).
    """
    from ..ops.fft import spacetime_power

    times = np.asarray(times)
    c_rt = jnp.asarray(c_rt)
    n_t, L = c_rt.shape[-2], c_rt.shape[-1]
    if len(times) != n_t:
        raise ValueError(f"times has {len(times)} entries for {n_t} rows")
    dt = float(np.mean(np.diff(times)))
    n_pos = (n_t - 1) // 2
    freqs = np.arange(1, n_pos + 1) / (n_t * dt)
    ks = 2.0 * np.pi * np.arange(L) / L
    return freqs, ks, spacetime_power(c_rt)
