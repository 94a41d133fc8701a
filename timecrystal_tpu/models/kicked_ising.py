"""Floquet kicked-Ising model, TPU-native.

Implements the three-step Floquet unitary of the reference
(src/models/kicked_ising.py:4-12, per PRL 117, 090402):

    U_F = exp[-i tau/2 sum_j (J sz_j sz_{j+1} + h_j sz_j)]
        x exp[-i pi/2 sum_j sx_j]
        x exp[-i tau/2 sum_j (J sz_j sz_{j+1} + h_j sz_j)]

Behavioral quirks of the reference that are replicated exactly for
numerics parity (SURVEY.md section 3):
  * quirk 2: each bond gate carries the full h_i and h_{i+1}, so interior
    sites see an effective 2*h_i field per half-step (kicked_ising.py:83-85).
  * quirk 3: even-index bonds first, then odd; the Ising sweep runs twice per
    Floquet step, each with angle tau/2 (kicked_ising.py:117-147).
  * quirk 4: the pi-pulse is exactly -i sigma_x per site (global phase
    (-i)^L per period).
  * quirk 5: disorder h_i ~ U[-h, h] from NumPy's legacy MT19937 stream when a
    seed is given (np.random.seed(seed); np.random.uniform) -- host-side,
    exactly as the reference (kicked_ising.py:55-59).  A scalable
    ``jax.random`` path is provided for large vmapped ensembles.

TPU-first differences (not a port): gates are analytic diagonal phases (no
scipy expm), all bonds of a sweep update in one batched SVD kernel, and the
period loop is a jit-compiled ``lax.scan`` (see dynamics/tebd.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import gates as G
from ..core.mps import MPS, apply_one_site_gates
from ..core.truncate import TruncParams, apply_bond_gates
from ..ops.cpx import C


def _tp_from(trunc_params: dict | TruncParams | None) -> TruncParams:
    """TruncParams from the reference-parity argument forms.  A PARTIAL
    dict keeps the documented reference defaults for missing keys
    (chi_max=100, trunc_cut=1e-10) -- raw from_dict would map a missing
    chi_max to 0 = uncapped, silently different physics (same guard as
    dynamics.tebd.CustomFloquet.__init__)."""
    if isinstance(trunc_params, TruncParams):
        return trunc_params
    if trunc_params is None:
        return TruncParams(chi_max=100, svd_min=1e-12, trunc_cut=1e-10)
    d = dict(trunc_params)
    d.setdefault("chi_max", 100)
    d.setdefault("trunc_cut", 1e-10)
    return TruncParams.from_dict(d)


class FloquetGates(NamedTuple):
    """Precomputed per-period gate set (pytree; vmap-able over disorder)."""

    bond_gates: C  # C[L-1, d, d, d, d] Ising half-step gates
    kick: C        # C[d, d] pi-pulse (or generalized X rotation)
    # Periodic-BC boundary gate C[d, d, d, d] for the SWAPPED layout
    # (left = site 0's field, right = site L-1's field), or None for open
    # chains.  Carrying it here lets every fused driver (floquet_period,
    # the merged frame, evolve_floquet_scan, evolve_floquet_auto) route the
    # boundary bond instead of silently evolving an open chain.
    boundary_gate: C | None = None


def make_floquet_gates(J, h_fields: jax.Array, tau, theta=np.pi,
                       dtype=jnp.float32, bc: str = "open") -> FloquetGates:
    """Build the analytic Floquet gate set from the disorder field vector.

    Pure jnp function: safe to call inside jit/vmap (e.g. vmapped over a
    batch of disorder realizations or a phase-diagram grid).
    """
    angles = G.ising_bond_phase_angles(J, h_fields, tau / 2.0)    # [L-1, 4]
    bond_gates = G.phases_to_bond_gates(angles, dtype=dtype)      # C[L-1,2,2,2,2]
    if isinstance(theta, (int, float, np.floating)) \
            and float(theta) == float(np.pi):
        # exact -i sigma_x fast path -- host floats only: a Python branch
        # on a TRACED theta would crash under jit/vmap (phase-diagram
        # grids sweep theta), and x_rotation_gate is exact at pi anyway
        kick = G.pi_pulse_gate(dtype=dtype)
    else:
        kick = G.x_rotation_gate(theta, dtype=dtype)
    boundary = None
    if bc == "periodic":
        # built for the SWAPPED layout (apply_boundary_gate_periodic moves
        # site 0 next to site L-1, where it sits on the LEFT)
        hb = jnp.stack([h_fields[0], h_fields[-1]])
        b_angles = G.ising_bond_phase_angles(J, hb, tau / 2.0)
        boundary = G.phases_to_bond_gates(b_angles, dtype=dtype)[0]
    return FloquetGates(bond_gates=bond_gates, kick=kick,
                        boundary_gate=boundary)


@partial(jax.jit, static_argnames=("tp",))
def floquet_period(psi: MPS, gates: FloquetGates, tp: TruncParams):
    """One full Floquet period U_F applied to the MPS.

    Sequence (reference kicked_ising.py:100-148): Ising half-step
    (even bonds, then odd bonds), pi-pulse on every site, Ising half-step
    again.  Periodic chains (gates.boundary_gate set) additionally apply
    the (L-1, 0) boundary bond via the swap network once per half-step,
    matching ``KickedIsingModel.floquet_step``'s periodic sequence.
    Returns (psi, truncation_error_sum).
    """
    psi, e1 = apply_bond_gates(psi, gates.bond_gates, start=0, tp=tp)
    psi, e2 = apply_bond_gates(psi, gates.bond_gates, start=1, tp=tp)
    eb1 = jnp.zeros((), psi.lam.dtype)
    if gates.boundary_gate is not None:
        psi, eb1 = apply_boundary_gate_periodic(psi, gates.boundary_gate, tp)
    psi = apply_one_site_gates(psi, gates.kick)
    psi, e3 = apply_bond_gates(psi, gates.bond_gates, start=0, tp=tp)
    psi, e4 = apply_bond_gates(psi, gates.bond_gates, start=1, tp=tp)
    eb2 = jnp.zeros((), psi.lam.dtype)
    if gates.boundary_gate is not None:
        psi, eb2 = apply_boundary_gate_periodic(psi, gates.boundary_gate, tp)
    return psi, e1 + e2 + e3 + e4 + eb1 + eb2


def _square_diagonal_gates(g: C) -> C:
    """Elementwise complex square of the (diagonal) Ising bond gates: turns
    the half-step phases exp(-i tau/2 H_b) into the full-step
    exp(-i tau H_b).  Valid precisely because the gates are diagonal
    (zero entries square to zero)."""
    return C(g.re * g.re - g.im * g.im, 2.0 * g.re * g.im)


@partial(jax.jit, static_argnames=("tp",))
def ising_half_step(psi: MPS, gates: FloquetGates, tp: TruncParams):
    """H = exp(-i tau/2 sum_b H_b) alone (even bonds then odd; plus the
    boundary bond for periodic chains)."""
    psi, e1 = apply_bond_gates(psi, gates.bond_gates, start=0, tp=tp)
    psi, e2 = apply_bond_gates(psi, gates.bond_gates, start=1, tp=tp)
    eb = jnp.zeros((), psi.lam.dtype)
    if gates.boundary_gate is not None:
        psi, eb = apply_boundary_gate_periodic(psi, gates.boundary_gate, tp)
    return psi, e1 + e2 + eb


@partial(jax.jit, static_argnames=("tp",))
def ising_half_step_inverse(psi: MPS, gates: FloquetGates, tp: TruncParams):
    """H^{-1} = H^dagger: conjugate of the diagonal phase gates."""
    inv = C(gates.bond_gates.re, -gates.bond_gates.im)
    psi, e1 = apply_bond_gates(psi, inv, start=0, tp=tp)
    psi, e2 = apply_bond_gates(psi, inv, start=1, tp=tp)
    eb = jnp.zeros((), psi.lam.dtype)
    if gates.boundary_gate is not None:
        inv_b = C(gates.boundary_gate.re, -gates.boundary_gate.im)
        psi, eb = apply_boundary_gate_periodic(psi, inv_b, tp)
    return psi, e1 + e2 + eb


@partial(jax.jit, static_argnames=("tp",))
def floquet_period_merged(phi: MPS, gates: FloquetGates, tp: TruncParams):
    """One Floquet period in the half-step frame phi = H psi.

    Because the two Ising half-steps H of consecutive periods commute (all
    bond terms are diagonal in z), U_F^n = H . K . H^2 . K ... H^2 . K . H:
    evolving phi_{j+1} = H^2 K phi_j costs ONE Ising sweep per period
    (2 batched SVD calls) instead of two (4 calls) -- a ~2x cut of the
    dominant cost.  Exactness of observables in this frame: H commutes with
    every sigma^z_i, so <sigma^z_i>, magnetization and staggered
    magnetization are EXACT; the Loschmidt echo is exact via
    |<phi_0|phi_j>|^2 = |<psi_0|psi_j>|^2 (same unitary H on both sides).
    Entanglement entropy / bond-dimension traces are those of the
    half-step-shifted state (the physical state differs by one H).
    Only valid for DIAGONAL bond gates (the kicked-Ising model); generic
    Trotter circuits must use ``floquet_period``.
    """
    full_bonds = _square_diagonal_gates(gates.bond_gates)
    phi = apply_one_site_gates(phi, gates.kick)
    phi, e1 = apply_bond_gates(phi, full_bonds, start=0, tp=tp)
    phi, e2 = apply_bond_gates(phi, full_bonds, start=1, tp=tp)
    eb = jnp.zeros((), phi.lam.dtype)
    if gates.boundary_gate is not None:
        # the boundary bond is part of H, diagonal like the rest: the
        # merged frame squares it with the others
        full_b = _square_diagonal_gates(gates.boundary_gate)
        phi, eb = apply_boundary_gate_periodic(phi, full_b, tp)
    return phi, e1 + e2 + eb


def apply_boundary_gate_periodic(psi: MPS, boundary_gate, tp: TruncParams):
    """Apply the (L-1, 0) boundary gate of a periodic chain via a swap
    network: swap site 0 rightward to position L-2, apply the gate at the
    last bond, swap back.  O(L) extra single-bond updates per application.
    Returns (psi, summed_discarded_weight).

    The reference's periodic path is broken (it calls TeNPy apply_local_op
    at site L-1 with a two-site operator, walking off the finite chain --
    SURVEY.md section 7 build note); this is the correct implementation.
    ``boundary_gate`` must be built for the SWAPPED layout: left = original
    site 0's field, right = original site L-1's field.
    """
    from ..core.truncate import apply_single_bond_gate, swap_gate

    L = psi.L
    if L <= 2:
        return apply_single_bond_gate(psi, boundary_gate, 0, tp)
    sw = swap_gate(psi.d, psi.dtype)
    disc = jnp.zeros((), psi.lam.dtype)
    for b in range(0, L - 2):          # site 0 -> position L-2
        psi, e = apply_single_bond_gate(psi, sw, b, tp)
        disc = disc + e
    psi, e = apply_single_bond_gate(psi, boundary_gate, L - 2, tp)
    disc = disc + e
    for b in range(L - 3, -1, -1):     # swap back
        psi, e = apply_single_bond_gate(psi, sw, b, tp)
        disc = disc + e
    return psi, disc


def draw_disorder_reference(n_sites: int, h_disorder: float,
                            disorder_seed: int | None) -> np.ndarray:
    """Disorder fields with exact reference RNG parity (quirk 5)."""
    if disorder_seed is not None:
        np.random.seed(disorder_seed)
    return np.random.uniform(-h_disorder, h_disorder, n_sites)


def draw_disorder_batch(key: jax.Array, n_realizations: int, n_sites: int,
                        h_disorder: float) -> jax.Array:
    """Scalable jax.random disorder batch [R, L] for vmapped ensembles."""
    return jax.random.uniform(key, (n_realizations, n_sites),
                              minval=-h_disorder, maxval=h_disorder)


class KickedIsingModel:
    """Floquet kicked-Ising model for discrete time crystal simulations.

    API-parity with reference src/models/kicked_ising.py:25-303, backed by
    the TPU-native MPS core.  The thin host-side class owns parameters and
    the precomputed gate set; all heavy numerics are jitted device code.
    """

    def __init__(self, n_sites: int, J: float, h_disorder: float, tau: float,
                 bc: str = "open", disorder_seed: int | None = None,
                 h_fields: np.ndarray | None = None,
                 theta: float = np.pi,
                 chi: int = 64, dtype=jnp.float32):
        if bc not in ("open", "periodic"):
            raise ValueError(f"Unknown boundary condition: {bc}")
        self.n_sites = int(n_sites)
        self.J = float(J)
        self.h_disorder = float(h_disorder)
        self.tau = float(tau)
        self.bc = bc
        self.theta = float(theta)
        self.chi = int(chi)
        self.dtype = dtype

        if h_fields is not None:
            self.h_fields = np.asarray(h_fields, dtype=np.float64)
        else:
            self.h_fields = draw_disorder_reference(n_sites, h_disorder, disorder_seed)

        # For periodic chains the gate set carries the boundary gate, so
        # EVERY fused driver (CustomFloquet, evolve_floquet_scan/auto, the
        # merged frame) routes the boundary bond -- the reference's own
        # periodic path is broken (apply_local_op at site L-1 with a 2-site
        # op walks off the chain); ours uses the swap network
        # (apply_boundary_gate_periodic).
        self.gates = make_floquet_gates(self.J, jnp.asarray(self.h_fields),
                                        self.tau, theta=self.theta,
                                        dtype=dtype, bc=bc)
        self.boundary_gate = self.gates.boundary_gate

    # -- reference-parity surface ------------------------------------------

    def floquet_step(self, psi: MPS, trunc_params: dict | TruncParams | None = None) -> MPS:
        """Apply one Floquet step (reference kicked_ising.py:100-126).

        Periodic BC applies the boundary bond once per Ising half-step via
        the swap network (the reference intended the boundary gate inside
        its even/odd loop, kicked_ising.py:92-98, but its call crashes);
        ``floquet_period`` routes it from ``gates.boundary_gate``, so the
        fused scan drivers evolve the same physics as this step-wise path."""
        psi_new, _ = floquet_period(psi, self.gates, _tp_from(trunc_params))
        return psi_new

    def evolve(self, psi_initial: MPS, n_steps: int,
               trunc_params: dict | TruncParams | None = None,
               fetch_every: int | None = None):
        """Multi-step evolution returning (states, times); reference
        kicked_ising.py:210-239.  The states list is materialized on host for
        API parity -- use dynamics.tebd.CustomFloquet for the fused in-scan
        observable path that avoids O(n_steps) state copies.

        Host fetches are CHUNKED: every ``fetch_every`` periods the pending
        device states are stacked into one array pair and fetched in a
        single round trip, instead of one ~25 ms tunnel fetch per period
        (at 200 periods that latency alone was ~5 s).  Default None sizes
        the chunk so pending states stay under ~256 MB of HBM (keeping
        every per-step MPS device-resident OOMs long runs at L=40
        chi=512, ~340 MB/state); the returned states are identical either
        way (fetch batching is pure transport)."""
        tp = _tp_from(trunc_params)
        if fetch_every is None:
            nbytes = ((2 * psi_initial.B.re.size + psi_initial.lam.size)
                      * psi_initial.B.re.dtype.itemsize)
            fetch_every = int(max(1, min(32, (256 * 2**20) // max(nbytes, 1))))
        states = [psi_initial]
        times = [0.0]
        psi = psi_initial
        pending: list = []

        def flush():
            if not pending:
                return
            # ONE stacked fetch for the whole chunk (one tunnel round trip),
            # split back into per-period MPS views host-side
            stacked = jax.device_get(
                jax.tree.map(lambda *xs: jnp.stack(xs), *pending))
            for i in range(len(pending)):
                states.append(jax.tree.map(lambda x: x[i], stacked))
            pending.clear()

        for step in range(n_steps):
            psi, _ = floquet_period(psi, self.gates, tp)
            pending.append(psi)
            times.append((step + 1) * 2 * self.tau)  # full period = 2 tau
            if len(pending) >= fetch_every:
                flush()
        flush()
        return states, times

    def get_hamiltonian_terms(self) -> dict:
        """Hamiltonian terms for analysis (reference kicked_ising.py:241-254)."""
        ising_gates = [
            np.asarray(
                G.expm_two_site(
                    G.two_site_hamiltonian(self.J, self.h_fields[i], self.h_fields[i + 1]),
                    self.tau / 2.0,
                )
            )
            for i in range(self.n_sites - 1)
        ]
        # no n_sites > 2 guard: the dynamics path applies the boundary gate
        # for L = 2 too (a 2-site ring genuinely has two bonds), and the
        # analysis terms must reconstruct the unitary actually applied
        if self.bc == "periodic":
            ising_gates.append(np.asarray(G.expm_two_site(
                G.two_site_hamiltonian(self.J, self.h_fields[-1], self.h_fields[0]),
                self.tau / 2.0)))
        # theta != pi models kick with exp(-i theta/2 sigma_x), not the
        # exact -i sigma_x: report the gate actually applied (host numpy,
        # f64 regardless of the session's x64 flag)
        if abs(self.theta - np.pi) < 1e-15:
            pulse = np.asarray(-1j * G.SIGMA_X)
        else:
            th = float(self.theta)
            pulse = (np.cos(th / 2) * np.eye(2)
                     - 1j * np.sin(th / 2) * np.asarray(G.SIGMA_X))
        return {
            "J": self.J,
            "h_fields": self.h_fields,
            "tau": self.tau,
            "pi_pulse": pulse,
            "ising_gates": ising_gates,
        }

    def calculate_phase_diagram_point(self, psi_initial: MPS, n_steps: int = 200,
                                      trunc_params: dict | None = None) -> dict:
        """Observables for one phase-diagram point (reference
        kicked_ising.py:256-303), computed with the fused scan path."""
        from ..core import observables as obs
        from ..dynamics.tebd import CustomFloquet

        flo = CustomFloquet(self, trunc_params)
        traces, times, info = flo.evolve_floquet_traces(psi_initial, n_steps)
        drive_period = 2 * self.tau
        # reference parity, bins included: the reference feeds the PHYSICAL
        # drive period into subharmonic_response, whose fftfreq uses UNIT
        # (per-sample) spacing (reference kicked_ising.py:288-289 +
        # observables.py:124-150), so for tau != 0.5 the 'fundamental' and
        # 'subharmonic' bins land off the true per-sample frequencies (1.0
        # and 0.5).  Kept bit-faithful; the detection pipeline
        # (analysis.detection) uses the correctly-binned A2T recipe instead.
        fund_amp, subharm_amp = obs.subharmonic_response(traces["magnetization"], drive_period)
        sz_final = traces["sz_sites"][-1]
        mag_a = np.mean(sz_final[0::2])
        mag_b = np.mean(sz_final[1::2])
        return {
            "loschmidt_echo_final": float(traces["loschmidt_echo"][-1]),
            "subharmonic_amplitude": float(subharm_amp),
            "fundamental_amplitude": float(fund_amp),
            "order_parameter": float(abs(mag_a - mag_b)),
            "max_bond_dimension": int(info["final_bond_dim"]),
            "final_magnetization": float(traces["magnetization"][-1]),
        }
