"""Batched two-site MPS updates: theta contraction -> SVD -> truncation.

This is the correctness heart of the framework (SURVEY.md section 7, step 2).
It replaces the implicit native kernel surface the reference outsources to
TeNPy/LAPACK (theta build + gesdd SVD + truncation inside
``psi.apply_local_op``, reference src/models/kicked_ising.py:162-188).

TPU-first design decisions:
  * All bonds of one even (or odd) sweep are data-independent, so they are
    updated as ONE batched kernel: theta tensors [n_bonds, chi*d, d*chi] fed
    to a batched complex SVD (SURVEY.md section 2.3 "sites/bonds within one
    sweep").  Complex arithmetic is real-pair math (ops/cpx.py) because the
    TPU backend has no complex dtypes; the SVD is ops/csvd.py (no native SVD
    on TPU either).
  * Fixed shapes: the bond dimension is always the padded ``chi``;
    truncation is a mask over Schmidt values, not a dynamic shape change.
  * Hastings-style update: the new left tensor is built from theta *without*
    the left Schmidt values (no division by small lambdas).

Truncation semantics mirror TeNPy's ``truncate`` options
(reference src/dynamics/tebd_evolution.py:41-46):
  chi_max  -- keep at most chi_max Schmidt values (<= padded chi),
  svd_min  -- drop singular values below this absolute threshold,
  trunc_cut-- drop the largest tail whose total discarded weight
              sqrt(sum_discarded S^2) stays below trunc_cut.
Quirk replicated: the reference's hot path never forwards trunc_params into
apply_local_op (SURVEY.md section 3, quirk 1), i.e. it runs effectively
truncation-free up to tiny-SV trimming; ``TruncParams.reference_hot_path``
reproduces that mode.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.cpx import C
from ..ops.csvd import csvd_topk
from .mps import MPS


# Saturated-steady-state SVD fast paths whose reported trunc_err carries
# the projection leak + f32 Frobenius noise floor (~3e-4/period) rather
# than the true discarded weight.  Chi-escalation decisions must never
# read error off these methods (see TruncParams.svd_method note below);
# the staged drivers route them only at the ladder cap.
PROJECTED_SVD_METHODS = frozenset(
    {"jacobi_proj", "jacobi_core", "jacobi_core_fast"})


class TruncParams(NamedTuple):
    chi_max: int = 0          # 0 => no chi cap beyond the padded chi
    svd_min: float = 1e-12
    trunc_cut: float = 0.0    # 0 => disabled
    renormalize: bool = True
    # 'native' | 'gram_eigh' | 'jacobi' | 'auto', plus the saturated-chi
    # steady-state fast paths 'jacobi_proj' / 'jacobi_core' /
    # 'jacobi_core_fast' (opt-in: their reported trunc_err carries the
    # projection leak + f32 noise floor and must not drive chi-escalation;
    # the _fast variant is additionally gated to steep saturated spectra
    # -- see ops/csvd.csvd_topk)
    svd_method: str = "auto"
    jacobi_sweeps: int = 0    # 0 = dtype default (ops/pallas/jacobi_svd)

    @classmethod
    def reference_hot_path(cls) -> "TruncParams":
        """The mode the reference actually runs in (quirk 1): unbounded chi
        (up to padding) with tiny singular values trimmed."""
        return cls(chi_max=0, svd_min=1e-14, trunc_cut=0.0, renormalize=True)

    @classmethod
    def from_dict(cls, d: dict | None) -> "TruncParams":
        if d is None:
            return cls(chi_max=100, svd_min=1e-12)  # reference defaults, kicked_ising.py:112
        return cls(
            chi_max=int(d.get("chi_max", 0) or 0),
            svd_min=float(d.get("svd_min", 1e-12)),
            trunc_cut=float(d.get("trunc_cut", 0.0) or 0.0),
            renormalize=bool(d.get("renormalize", True)),
            svd_method=str(d.get("svd_method", "auto")),
            jacobi_sweeps=int(d.get("jacobi_sweeps", 0)),
        )


def truncation_mask(S: jax.Array, chi: int, tp: TruncParams) -> jax.Array:
    """Boolean keep-mask over singular values S [..., chi] (sorted desc)."""
    k = jnp.arange(S.shape[-1])
    mask = jnp.ones(S.shape, dtype=bool)
    if tp.chi_max and tp.chi_max < chi:
        mask &= k < tp.chi_max
    if tp.svd_min > 0.0:
        mask &= S >= tp.svd_min
    if tp.trunc_cut > 0.0:
        # discard the largest suffix with total discarded weight <=
        # trunc_cut^2, jointly with the other criteria: weight already
        # discarded by them counts toward the budget.
        disc_sq = jnp.where(mask, 0.0, S * S)
        keep_sq = jnp.where(mask, S * S, 0.0)
        tail_sq = jnp.cumsum(keep_sq[..., ::-1], axis=-1)[..., ::-1]
        total_disc = jnp.sum(disc_sq, axis=-1, keepdims=True)
        mask &= (tail_sq + total_disc) > tp.trunc_cut**2
    return mask


@partial(jax.jit, static_argnames=("start", "tp"))
def apply_bond_gates(psi: MPS, gates: C, start: int, tp: TruncParams):
    """Apply two-site gates to every bond (start, start+2, ...) in one batch.

    Args:
      psi:   MPS with L sites.
      gates: C[n_bonds_total(L-1), d, d, d, d] gate per bond, indexed by
             bond; convention gates[b, p_out, q_out, p_in, q_in].
      start: 0 for even bonds, 1 for odd bonds (static).
      tp:    truncation parameters (static).

    Returns:
      (new MPS, trunc_err) where trunc_err is the summed discarded weight
      (sum of discarded S^2) over the bonds updated in this sweep.

    Replaces the serial per-bond loop at reference kicked_ising.py:128-148
    (one TeNPy apply_local_op + MPS copy per bond) with a single batched
    contraction + batched SVD that XLA maps onto the MXU.

    NOTE: the update algebra here deliberately duplicates
    ``bond_update_core`` (the single-bond path used by site_shard boundary
    bonds and the periodic swap network) rather than vmapping it -- this
    is THE hot path and its compiled form is what every benchmark
    measures.  Any change to the truncation/renormalization logic must be
    made in BOTH; tests/test_core_mps.py::test_batched_matches_single_bond
    pins them together.
    """
    L, chi, d, _ = psi.B.re.shape
    idx_np = np.arange(start, L - 1, 2)  # static bond indices
    n = len(idx_np)
    if n == 0:
        return psi, jnp.zeros((), dtype=psi.lam.dtype)
    idx = jnp.asarray(idx_np)

    Bl = psi.B[idx]           # C[n, chi, d, chi]
    Br = psi.B[idx + 1]       # C[n, chi, d, chi]
    lamL = psi.lam[idx]       # [n, chi] real
    g = gates[idx]            # C[n, d, d, d, d]

    # theta_tilde = B_l B_r (no left lambda -- Hastings), then gate
    theta_tilde = cpx.einsum("napb,nbqc->napqc", Bl, Br)
    theta_tilde = cpx.einsum("npqrs,narsc->napqc", g, theta_tilde)
    theta = theta_tilde * lamL[:, :, None, None, None]

    M = theta.reshape(n, chi * d, d * chi)
    # top-chi truncated SVD: the padded-chi cap IS the truncation, so only
    # the kept triplets are ever computed (on TPU this halves the eigh the
    # whole period cost is dominated by -- see ops/csvd.csvd_topk)
    S_top, Vh_top, disc_tail = csvd_topk(M, chi, method=tp.svd_method,
                                         jacobi_sweeps=tp.jacobi_sweeps)

    mask = truncation_mask(S_top, chi, tp)
    S_kept = jnp.where(mask, S_top, 0.0)

    # discarded weight: everything masked out plus the tail beyond padded chi
    disc = jnp.sum(jnp.where(mask, 0.0, S_top * S_top)) + jnp.sum(disc_tail)

    nrm = jnp.sqrt(jnp.sum(S_kept * S_kept, axis=-1, keepdims=True))  # [n, 1]
    nrm = jnp.maximum(nrm, 1e-30)
    S_new = S_kept / nrm if tp.renormalize else S_kept

    mask_f = mask.astype(psi.dtype)
    Vh_kept = Vh_top * mask_f[:, :, None]           # C[n, chi, d*chi]
    Br_new = Vh_kept.reshape(n, chi, d, chi)

    # Hastings: B_l_new = theta_tilde . V_kept  (columns masked via Vh_kept)
    Mt = theta_tilde.reshape(n, chi * d, d * chi)
    Bl_new = cpx.einsum("nij,nkj->nik", Mt, Vh_kept.conj())  # C[n, chi*d, chi]
    if tp.renormalize:
        Bl_new = Bl_new * (1.0 / nrm)[:, :, None]
    Bl_new = Bl_new.reshape(n, chi, d, chi)

    B = cpx.at_set(cpx.at_set(psi.B, idx, Bl_new), idx + 1, Br_new)
    lam = psi.lam.at[idx + 1].set(S_new.astype(psi.lam.dtype))
    return MPS(B=B, lam=lam), disc.astype(psi.lam.dtype)


def bond_update_core(Bl: C, Br: C, lamL: jax.Array, gate: C,
                     tp: TruncParams):
    """Two-site update on bare tensors: (Bl [chi,d,chi], Br, lamL [chi],
    gate [d,d,d,d]) -> (Bl_new, Br_new, S_new, disc).

    The single-bond Hastings update shared by ``apply_single_bond_gate``
    and the cross-device boundary bonds of the site-sharded sweep
    (parallel/site_shard.py)."""
    chi, d, _ = Bl.re.shape
    theta_tilde = cpx.einsum("apb,bqc->apqc", Bl, Br)
    theta_tilde = cpx.einsum("pqrs,arsc->apqc", gate, theta_tilde)
    theta = theta_tilde * lamL[:, None, None, None]
    M = theta.reshape(chi * d, d * chi)
    S_top, Vh_top, disc_tail = csvd_topk(M, chi, method=tp.svd_method,
                                         jacobi_sweeps=tp.jacobi_sweeps)
    mask = truncation_mask(S_top, chi, tp)
    S_kept = jnp.where(mask, S_top, 0.0)
    disc = jnp.sum(jnp.where(mask, 0.0, S_top * S_top)) + disc_tail
    nrm = jnp.maximum(jnp.sqrt(jnp.sum(S_kept * S_kept)), 1e-30)
    S_new = S_kept / nrm if tp.renormalize else S_kept
    Vh_kept = Vh_top * mask[:, None].astype(Bl.dtype)
    Br_new = Vh_kept.reshape(chi, d, chi)
    Mt = theta_tilde.reshape(chi * d, d * chi)
    Bl_new = cpx.einsum("ij,kj->ik", Mt, Vh_kept.conj())
    if tp.renormalize:
        Bl_new = Bl_new * (1.0 / nrm)
    Bl_new = Bl_new.reshape(chi, d, chi)
    return Bl_new, Br_new, S_new, disc


@partial(jax.jit, static_argnames=("bond", "tp"))
def apply_single_bond_gate(psi: MPS, gate: C, bond: int, tp: TruncParams):
    """Apply one two-site gate at a single (static) bond.

    Used by the periodic-BC swap network and sweeped algorithms; the batched
    ``apply_bond_gates`` remains the hot path.  Returns (psi, disc)."""
    Bl_new, Br_new, S_new, disc = bond_update_core(
        psi.B[bond], psi.B[bond + 1], psi.lam[bond], gate, tp)
    B = cpx.at_set(cpx.at_set(psi.B, bond, Bl_new), bond + 1, Br_new)
    lam = psi.lam.at[bond + 1].set(S_new.astype(psi.lam.dtype))
    return MPS(B=B, lam=lam), disc.astype(psi.lam.dtype)


def swap_gate(d: int = 2, dtype=jnp.float32) -> C:
    """SWAP gate [p, q, r, s] = delta_{p s} delta_{q r}."""
    eye = jnp.eye(d, dtype=dtype)
    re = jnp.einsum("ps,qr->pqrs", eye, eye)
    return C(re, jnp.zeros_like(re))


def apply_two_site_gate(psi: MPS, gate, i: int, j: int,
                        trunc_params: dict | TruncParams | None = None) -> MPS:
    """Apply a single d^2 x d^2 gate on adjacent sites (i, j).

    API-parity port of reference src/core/tensor_utils.py:65-105.
    ``gate`` may be a complex numpy array [d*d, d*d] / [d, d, d, d] or a C.
    """
    if abs(i - j) != 1:
        raise ValueError("Sites must be adjacent for two-site gate")
    tp = trunc_params if isinstance(trunc_params, TruncParams) else TruncParams.from_dict(
        trunc_params if isinstance(trunc_params, dict) else None)
    L, chi, d, _ = psi.B.re.shape
    if not isinstance(gate, C):
        gate = cpx.from_numpy(np.asarray(gate), dtype=psi.dtype)
    g = gate.reshape(d, d, d, d)
    if i > j:
        # caller gave (right, left): exchange the gate's two site axes so
        # an asymmetric gate (e.g. CNOT) keeps its control on site i
        i, j = j, i
        g = g.transpose(1, 0, 3, 2)
    # single-bond update: ONLY bond i is re-SVD'd/truncated -- routing the
    # gate through the batched same-parity kernel would also re-truncate
    # and renormalize every untouched same-parity bond
    psi_new, _ = apply_single_bond_gate(psi, g, i, tp)
    return psi_new
