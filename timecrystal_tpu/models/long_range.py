"""Long-range kicked-Ising model: power-law ZZ couplings J/|i-j|^alpha.

The reference ABSTRACT advertises sweeping "the drive strength,
interaction range, and disorder" (/root/reference/README.md:19), but its
code implements nearest-neighbor bonds only
(/root/reference/src/models/kicked_ising.py:73-98) -- the
interaction-range axis exists nowhere in its source.  This module
supplies the missing axis TPU-natively:

  * J(r) = J / r^alpha is fitted by a sum of ``n_exp`` exponentials
    (``fit_power_law_exponentials``; the fit residual is measured and
    carried on the model), which gives the Ising half-step Hamiltonian

        H_z = sum_{i<j} J(j-i) sz_i sz_j + sum_i h_i sz_i

    an exact finite-state-machine MPO of bond dimension n_exp + 2
    (``long_range_ising_mpo`` / ``build_fsm_mpo``).
  * the Floquet period  U_F = e^{-i tau/2 H_z} . KICK . e^{-i tau/2 H_z}
    is integrated with the existing two-site TDVP engine
    (dynamics/tdvp.py): a long-range DIAGONAL unitary has no low-rank
    nearest-neighbor gate decomposition (the cross-cut phase depends on
    exponentially many left configurations), so the MPO-projector
    integrator is the right TPU shape -- batched small contractions and
    a static Lanczos unroll instead of O(L^2) swap networks.
  * ``alpha=None`` (or ``inf``) reduces exactly to nearest-neighbor
    couplings (single channel, lam = 0).

Physics note: the trapped-ion DTC realizations (Zhang et al., Nature
543, 217 (2017)) are long-range kicked Isings with alpha ~ 0.5-1.8;
this extension lets phase scans add the interaction-range axis the
reference abstract promises.

Semantics are CLEAN (an extension, not a parity surface): disorder
fields enter the MPO once -- the reference's interior double-counting
quirk (SURVEY.md quirk 2) applies to its nearest-neighbor gate path
only, and there is no reference long-range implementation to be
bit-compatible with.  Validated against a dense diagonal-phase oracle
in tests/test_long_range.py.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import gates as G
from ..core.mps import MPS, apply_one_site_gates
from ..core.truncate import TruncParams
from .kicked_ising import draw_disorder_reference


def fit_power_law_exponentials(alpha: float, r_max: int, n_exp: int = 12
                               ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Fit r^{-alpha} on r = 1..r_max by sum_k c_k lam_k^r.

    Relative least squares on a log-spaced decay-rate grid (the grid
    upper end scales with alpha so steep laws resolve the r=1 -> 2
    drop).  Returns (c [n_exp], lam [n_exp], max relative error).
    n_exp=12 reaches ~1e-5 relative for alpha <= 2 at r_max = 64.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    if r_max < 2:
        # a single distance: one channel reproduces it exactly
        return np.array([1.0]), np.array([0.0]), 0.0
    r = np.arange(1, r_max + 1, dtype=np.float64)
    target = r ** (-float(alpha))
    x = np.logspace(np.log10(0.5 / r_max),
                    np.log10(max(6.0, 2.5 * float(alpha))), int(n_exp))
    lam = np.exp(-x)
    A = lam[None, :] ** r[:, None]
    # rows scaled by 1/target => minimize the RELATIVE residual
    c, *_ = np.linalg.lstsq(A / target[:, None], np.ones_like(r), rcond=None)
    rel = float(np.max(np.abs(A @ c - target) / target))
    return c, lam, rel


def build_fsm_mpo(L: int,
                  channels: List[Tuple[float, float, np.ndarray, np.ndarray]],
                  onsite: np.ndarray | List[np.ndarray] | None,
                  d: int = 2, dtype=jnp.float32):
    """Finite-state-machine MPO for exponentially decaying couplings.

    ``channels``: [(c_k, lam_k, A_k, B_k)] encoding
    H = sum_k sum_{i<j} c_k lam_k^{j-i} A_k(i) B_k(j) + sum_i onsite_i.
    lam_k = 0 gives the nearest-neighbor-only channel (0^0 treated via
    the start weight: coefficient at distance 1 is c_k lam_k^1 unless
    lam_k = 0, where the start weight c_k applies to distance 1 alone).

    Same boundary convention as dynamics.tdvp.build_mpo (lower
    triangular: left edge row Dw-1, right edge column 0); generalizes it
    by the per-channel decay on the carry diagonal W[i, 1+k, 1+k].
    """
    from ..dynamics.tdvp import MPO

    nc = len(channels)
    Dw = nc + 2
    W = np.zeros((L, Dw, Dw, d, d), dtype=complex)
    eye = np.eye(d)
    if onsite is None:
        onsite = np.zeros((d, d))
    onsite_list = ([np.asarray(onsite)] * L if np.ndim(onsite) == 2
                   else list(onsite))
    if len(onsite_list) != L:
        raise ValueError(f"onsite list has {len(onsite_list)} entries, "
                         f"expected {L}")
    for i in range(L):
        W[i, 0, 0] = eye
        W[i, Dw - 1, Dw - 1] = eye
        W[i, Dw - 1, 0] = onsite_list[i]
        for k, (ck, lamk, A, B) in enumerate(channels):
            # start: weight so distance-1 pairs get c_k lam_k (or c_k
            # when lam_k = 0, the nearest-neighbor channel)
            start = ck * lamk if lamk != 0.0 else ck
            W[i, Dw - 1, 1 + k] = start * np.asarray(A)
            W[i, 1 + k, 1 + k] = lamk * eye
            W[i, 1 + k, 0] = np.asarray(B)
    return MPO(W=G.gate_from_numpy(W, dtype=dtype))


def long_range_ising_mpo(L: int, J: float, alpha: float | None,
                         h_fields, n_exp: int = 12, dtype=jnp.float32):
    """H_z = sum_{i<j} (J/|i-j|^alpha) sz_i sz_j + sum_i h_i sz_i as an
    FSM MPO.  Returns (mpo, max relative fit error of J(r)).

    alpha=None or inf: exact nearest-neighbor couplings (fit error 0).
    """
    hf = np.asarray(h_fields, dtype=np.float64)
    onsite = [hf[i] * G.SIGMA_Z for i in range(L)]
    if alpha is None or np.isinf(alpha):
        channels = [(float(J), 0.0, G.SIGMA_Z, G.SIGMA_Z)]
        return build_fsm_mpo(L, channels, onsite, dtype=dtype), 0.0
    c, lam, rel = fit_power_law_exponentials(float(alpha), L - 1, n_exp)
    channels = [(float(J) * float(ck), float(lk), G.SIGMA_Z, G.SIGMA_Z)
                for ck, lk in zip(c, lam)]
    return build_fsm_mpo(L, channels, onsite, dtype=dtype), rel


def power_law_couplings(L: int, J: float, alpha: float | None) -> np.ndarray:
    """The exact coupling table J(r) for r = 1..L-1 (dense-oracle use)."""
    r = np.arange(1, L, dtype=np.float64)
    if alpha is None or np.isinf(alpha):
        out = np.zeros(L - 1)
        out[0] = J
        return out
    return J * r ** (-float(alpha))


def fitted_couplings(L: int, J: float, alpha: float | None,
                     n_exp: int = 12) -> np.ndarray:
    """J(r) as the MPO actually encodes it (the exponential-sum fit) --
    lets oracle tests isolate integrator error from fit error."""
    if alpha is None or np.isinf(alpha):
        return power_law_couplings(L, J, alpha)
    c, lam, _ = fit_power_law_exponentials(float(alpha), L - 1, n_exp)
    r = np.arange(1, L, dtype=np.float64)
    return J * (lam[None, :] ** r[:, None] @ c)


class LongRangeKickedIsing:
    """Floquet kicked-Ising with power-law ZZ interactions (TDVP-driven).

    U_F = exp(-i tau/2 H_z) . exp(-i theta/2 sum_j sx_j) . exp(-i tau/2 H_z)
    with H_z = sum_{i<j} (J/|i-j|^alpha) sz_i sz_j + sum_i h_i sz_i.

    The half-step is integrated by two-site TDVP under the FSM MPO in
    ``substeps`` equal dt slices; the kick is the exact one-site gate.
    Mirrors the ``KickedIsingModel`` constructor surface (disorder_seed /
    h_fields / theta / chi / dtype) plus (alpha, n_exp, substeps).
    """

    def __init__(self, n_sites: int, J: float, h_disorder: float, tau: float,
                 alpha: float | None = 1.5, disorder_seed: int | None = None,
                 h_fields: np.ndarray | None = None, theta: float = np.pi,
                 chi: int = 64, n_exp: int = 12, substeps: int = 2,
                 lanczos_params: dict | None = None, dtype=jnp.float32):
        self.n_sites = int(n_sites)
        self.J = float(J)
        self.h_disorder = float(h_disorder)
        self.tau = float(tau)
        self.alpha = None if alpha is None else float(alpha)
        self.theta = float(theta)
        self.chi = int(chi)
        self.n_exp = int(n_exp)
        self.substeps = int(substeps)
        self.dtype = dtype
        if h_fields is not None:
            self.h_fields = np.asarray(h_fields, dtype=np.float64)
        else:
            self.h_fields = draw_disorder_reference(
                n_sites, h_disorder, disorder_seed)
        self.mpo, self.fit_rel_err = long_range_ising_mpo(
            self.n_sites, self.J, self.alpha, self.h_fields,
            n_exp=self.n_exp, dtype=dtype)
        if float(self.theta) == float(np.pi):
            self.kick = G.pi_pulse_gate(dtype=dtype)
        else:
            self.kick = G.x_rotation_gate(self.theta, dtype=dtype)
        # engine construction is deferred (dynamics imports models)
        from ..dynamics.tdvp import DEFAULT_LANCZOS, TDVPEvolution

        self._engine = TDVPEvolution(
            self.mpo, dt=self.tau / 2.0 / self.substeps, max_chi=self.chi,
            tdvp_type="two_site",
            trunc_params=TruncParams(chi_max=self.chi, svd_min=1e-12),
            lanczos_params={**DEFAULT_LANCZOS, **(lanczos_params or {})})

    def _half_step(self, psi: MPS) -> MPS:
        for _ in range(self.substeps):
            psi, _ = self._engine.step(psi)
        return psi

    def floquet_step(self, psi: MPS,
                     trunc_params: dict | TruncParams | None = None) -> MPS:
        """One Floquet period (same method name as KickedIsingModel)."""
        if trunc_params is not None:
            # match the nearest-neighbor model's surface: per-call trunc
            # override routes into the TDVP engine
            saved = self._engine.trunc_params
            if isinstance(trunc_params, TruncParams):
                self._engine.trunc_params = trunc_params
            else:
                d = dict(trunc_params)
                d.setdefault("chi_max", self.chi)
                self._engine.trunc_params = TruncParams.from_dict(d)
            try:
                return self._floquet_step_inner(psi)
            finally:
                self._engine.trunc_params = saved
        return self._floquet_step_inner(psi)

    def _floquet_step_inner(self, psi: MPS) -> MPS:
        psi = self._half_step(psi)
        psi = apply_one_site_gates(psi, self.kick)
        return self._half_step(psi)

    def evolve(self, psi_initial: MPS, n_periods: int):
        """Evolve recording (traces, times): sz_sites [n+1, L],
        magnetization, staggered, loschmidt_echo -- the CustomFloquet
        trace contract, host-looped (TDVP steps are not scanned)."""
        import time as _time

        from ..core import observables as obs

        L = self.n_sites
        sz = [np.asarray(obs.sz_sites(psi_initial))]
        le = [1.0]
        psi = psi_initial
        start = _time.time()
        for _ in range(n_periods):
            psi = self._floquet_step_inner(psi)
            sz.append(np.asarray(obs.sz_sites(psi)))
            le.append(float(np.asarray(
                obs.calculate_loschmidt_echo(psi_initial, psi))))
        wall = _time.time() - start
        sz_arr = np.asarray(sz)
        signs = np.asarray([1.0 if i % 2 == 0 else -1.0 for i in range(L)])
        traces = {
            "sz_sites": sz_arr,
            "magnetization": sz_arr.sum(axis=1),
            "staggered_magnetization": (sz_arr * signs).sum(axis=1) / L,
            "loschmidt_echo": np.asarray(le),
        }
        times = np.arange(n_periods + 1) * 2 * self.tau
        info = {"wall_time": wall,
                "periods_per_second": n_periods / wall if wall > 0 else
                float("inf"),
                "fit_rel_err": self.fit_rel_err,
                "algorithm": "TDVP (two_site) long-range Floquet"}
        return traces, times, info


def scan_interaction_range(alphas, L: int = 12, J: float = 1.0,
                           h_disorder: float = 0.25, tau: float = 2.0,
                           theta: float = np.pi, n_periods: int = 24,
                           n_realizations: int = 3, chi: int = 48,
                           substeps: int = 2, seed0: int = 42,
                           dtype=jnp.float32, progress: bool = False):
    """Subharmonic response A2T vs interaction range alpha -- the scan the
    reference abstract promises ("sweeping the drive strength, interaction
    range, and disorder ... pinpoint regimes that sustain time-crystalline
    order", /root/reference/README.md:19).

    For each alpha, evolves ``n_realizations`` disorder draws (seeds
    seed0, seed0+1, ...) of ``LongRangeKickedIsing`` and extracts the
    subharmonic amplitude of the staggered magnetization at the
    period-doubling frequency (core.observables.
    extract_subharmonic_amplitude, the detection pipeline's A2T recipe).
    alpha entries may be None/inf for the nearest-neighbor limit.

    Returns {"alphas", "a2t" [n_alpha], "a2t_std", "fit_rel_err",
    "a2t_all" [n_alpha, n_realizations]}.
    """
    from ..core import observables as obs
    from ..core.mps import create_initial_state

    alphas = list(alphas)
    a2t_all = np.zeros((len(alphas), n_realizations))
    fit_errs = np.zeros(len(alphas))
    psi0 = create_initial_state(L, "neel", chi=chi, dtype=dtype)
    it = enumerate(alphas)
    if progress:
        try:
            from tqdm import tqdm
            it = tqdm(list(it), desc="alpha scan")
        except ImportError:
            pass
    for ia, alpha in it:
        for r in range(n_realizations):
            model = LongRangeKickedIsing(
                L, J, h_disorder, tau, alpha=alpha,
                disorder_seed=seed0 + r, theta=theta, chi=chi,
                substeps=substeps, dtype=dtype)
            traces, times, info = model.evolve(psi0, n_periods)
            a2t_all[ia, r] = obs.extract_subharmonic_amplitude(
                times, traces["staggered_magnetization"], 2 * tau)
        fit_errs[ia] = model.fit_rel_err
    return {
        "alphas": alphas,
        "a2t": a2t_all.mean(axis=1),
        "a2t_std": a2t_all.std(axis=1),
        "a2t_all": a2t_all,
        "fit_rel_err": fit_errs,
    }
