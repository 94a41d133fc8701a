"""Fixed-shape padded-bond Matrix Product States for TPU.

TPU-native replacement for the reference's TeNPy ``MPS`` objects
(reference: src/core/tensor_utils.py:28-62, tenpy.networks.mps.MPS).

Design (SURVEY.md section 7): an MPS is a pytree of *fixed-shape* arrays so
that every operation is jit/vmap/shard_map friendly:

  ``B``   : C([L, chi, d, chi]) -- right-canonical "B" tensors as a real
            (re, im) pair (TeNPy B-form: B_i = Gamma_i Lambda_i), axes
            (left, phys, right).  Complex dtypes do not exist on the axon
            TPU backend, so all complex arithmetic is explicit real-pair
            math (see ops/cpx.py) -- which is also the layout the MXU wants.
  ``lam`` : [L+1, chi] real       -- Schmidt values on every bond;
            lam[i] is the bond to the *left* of site i, lam[0]/lam[L]
            trivial.

Bond dimensions below the padded ``chi`` are represented by zero Schmidt
values and exactly-zero rows/columns of the neighboring B tensors, so all
contractions remain exact without dynamic shapes.  There are no per-gate
copies: updates are functional and happen inside ``lax.scan``.  The real
dtype is float32 on TPU and float64 for CPU parity runs (complex128
equivalent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.cpx import C


class MPS(NamedTuple):
    """Padded fixed-shape MPS in right-canonical (B, lambda) form."""

    B: C            # ([L, chi, d, chi], [L, chi, d, chi]) real pair
    lam: jax.Array  # [L+1, chi] real

    @property
    def L(self) -> int:
        return self.B.re.shape[0]

    @property
    def chi(self) -> int:
        return self.B.re.shape[1]

    @property
    def d(self) -> int:
        return self.B.re.shape[2]

    @property
    def dtype(self):
        return self.B.re.dtype


def pad_mps(psi: MPS, new_chi: int) -> MPS:
    """Embed an MPS into a larger padded bond dimension (exact: the new
    directions carry zero weight).  Used by chi-escalation resume
    (dynamics/tebd.evolve_floquet_auto) so a saturated run continues from
    its current state at 2x chi instead of restarting from t=0."""
    L, chi, d, _ = psi.B.re.shape
    if new_chi < chi:
        raise ValueError(f"pad_mps: new_chi {new_chi} < current chi {chi}")
    if new_chi == chi:
        return psi
    B_re = jnp.zeros((L, new_chi, d, new_chi), psi.dtype)
    B_re = B_re.at[:, :chi, :, :chi].set(psi.B.re)
    B_im = jnp.zeros((L, new_chi, d, new_chi), psi.dtype)
    B_im = B_im.at[:, :chi, :, :chi].set(psi.B.im)
    lam = jnp.zeros((L + 1, new_chi), psi.lam.dtype)
    lam = lam.at[:, :chi].set(psi.lam)
    return MPS(B=C(B_re, B_im), lam=lam)


def product_state(basis_indices, chi: int, d: int = 2, dtype=jnp.float32) -> MPS:
    """Build a product-state MPS |i_0 i_1 ... i_{L-1}> with padded bond chi.

    ``basis_indices``: int array [L] of local basis indices (0 = up for d=2).
    """
    basis_indices = jnp.asarray(basis_indices, dtype=jnp.int32)
    L = basis_indices.shape[0]
    onehot = jax.nn.one_hot(basis_indices, d, dtype=dtype)  # [L, d]
    B_re = jnp.zeros((L, chi, d, chi), dtype=dtype).at[:, 0, :, 0].set(onehot)
    B_im = jnp.zeros((L, chi, d, chi), dtype=dtype)
    lam = jnp.zeros((L + 1, chi), dtype=dtype).at[:, 0].set(1.0)
    return MPS(B=C(B_re, B_im), lam=lam)


def state_basis_indices(
    n_sites: int,
    state_type: str,
    d: int = 2,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Basis-index realization of a named product state ('up' == index 0).

    'random' DRAWS here (fresh default_rng unless ``rng`` is given) --
    callers that must reference one realization repeatedly (e.g. the
    chi-escalation driver's t=0 trace row / Loschmidt reference across
    ladder rebuilds and checkpoint resume) should call this ONCE and build
    states from the returned indices via ``product_state``."""
    if state_type == "all_up":
        return np.zeros(n_sites, dtype=np.int32)
    if state_type == "all_down":
        return np.full(n_sites, d - 1, dtype=np.int32)
    if state_type == "neel":
        return np.array([0 if i % 2 == 0 else d - 1 for i in range(n_sites)],
                        dtype=np.int32)
    if state_type == "random":
        gen = rng if rng is not None else np.random.default_rng()
        return gen.integers(0, d, size=n_sites).astype(np.int32)
    raise ValueError(f"Unknown state type: {state_type}")


def create_initial_state(
    n_sites: int,
    state_type: str = "all_up",
    chi: int = 64,
    d: int = 2,
    dtype=jnp.float32,
    rng: np.random.Generator | None = None,
) -> MPS:
    """Initial product states matching the reference catalogue.

    Reference: src/core/tensor_utils.py:28-62 (all_up / all_down / neel /
    random on TeNPy SpinHalfSite; 'up' == sigma_z = +1 == basis index 0).
    """
    idx = state_basis_indices(n_sites, state_type, d=d, rng=rng)
    return product_state(idx, chi=chi, d=d, dtype=dtype)


def haar_product_state(n_sites: int, chi: int, d: int = 2,
                       dtype=jnp.float32,
                       rng: np.random.Generator | None = None) -> MPS:
    """Product state with an independent Haar-random local unit vector per
    site (complex gaussian, normalized).

    Unlike ``create_initial_state(..., 'random')`` -- a random
    COMPUTATIONAL basis state, hence an exact eigenstate of every
    symmetry diagonal in the z basis -- this start carries weight in
    every symmetry sector.  It is the default start of the
    imaginary-time ground-state search (dynamics/ground_state.py), where
    a sector-pure start traps the descent in that sector's lowest state
    (e.g. a random basis state with total Sz != 0 can never reach the
    Heisenberg singlet ground state).
    """
    gen = rng if rng is not None else np.random.default_rng()
    v = gen.normal(size=(n_sites, d)) + 1j * gen.normal(size=(n_sites, d))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tensors = [v[i].reshape(1, d, 1) for i in range(n_sites)]
    lams = [np.ones(1)] * (n_sites + 1)
    return from_dense_tensors(tensors, lams, chi, dtype)


def from_dense_tensors(tensors: list[np.ndarray], lams: list[np.ndarray],
                       chi: int, dtype=jnp.float32) -> MPS:
    """Build a padded MPS from dense per-site B tensors [chi_l, d, chi_r]
    and per-bond Schmidt vectors (checkpoint restore, custom states)."""
    L = len(tensors)
    d = tensors[0].shape[1]
    B_re = np.zeros((L, chi, d, chi))
    B_im = np.zeros((L, chi, d, chi))
    lam = np.zeros((L + 1, chi))
    for i, T in enumerate(tensors):
        cl, _, cr = T.shape
        B_re[i, :cl, :, :cr] = T.real
        B_im[i, :cl, :, :cr] = np.imag(T)
    for i, s in enumerate(lams):
        lam[i, : len(s)] = s
    return MPS(B=C(jnp.asarray(B_re, dtype), jnp.asarray(B_im, dtype)),
               lam=jnp.asarray(lam, dtype))


# ---------------------------------------------------------------------------
# Basic linear-algebra queries
# ---------------------------------------------------------------------------

def apply_sz(psi: MPS, site: int) -> MPS:
    """sigma^z applied at one site (diagonal unitary: the right-canonical
    B-form and the Schmidt values are exactly preserved).  Used to seed
    the two-time correlator evolution phi(0) = sigma^z_i |psi0>
    (dynamics.tebd.evolve_two_time_zz)."""
    if psi.B.re.shape[2] != 2:
        raise ValueError("apply_sz requires local dimension d=2, got "
                         f"d={psi.B.re.shape[2]}")
    zdiag = jnp.asarray([1.0, -1.0], psi.dtype)
    re = psi.B.re.at[site].set(psi.B.re[site] * zdiag[None, :, None])
    im = psi.B.im.at[site].set(psi.B.im[site] * zdiag[None, :, None])
    return MPS(B=C(re, im), lam=psi.lam)


def overlap(psi1: MPS, psi2: MPS) -> C:
    """<psi1|psi2> for two right-canonical B-form MPS, as a C scalar.

    Reference: src/core/tensor_utils.py:183-193 (psi1.overlap(psi2)) and the
    Loschmidt echo at src/core/observables.py:11-26.  Implemented as a
    jit-compiled ``lax.scan`` transfer-matrix contraction on-device.
    """
    chi1, chi2 = psi1.chi, psi2.chi
    dtype = psi2.dtype
    E0 = cpx.C(jnp.zeros((chi1, chi2), dtype).at[0, 0].set(1.0),
               jnp.zeros((chi1, chi2), dtype))

    def step(E, Bs):
        B1, B2 = Bs
        # E'[b,c] = sum_{a,p,b'} conj(B1[a,p,b]) E[a,b'] B2[b',p,c]
        T = cpx.einsum("ab,bpc->apc", E, B2)
        E_new = cpx.einsum("apb,apc->bc", B1.conj(), T)
        return E_new, None

    E, _ = jax.lax.scan(step, E0, (psi1.B, psi2.B))
    return C(E.re[0, 0], E.im[0, 0])


def norm_squared(psi: MPS) -> jax.Array:
    """<psi|psi> (real)."""
    return overlap(psi, psi).re


def expectation_one_site(psi: MPS, op: C) -> C:
    """Per-site expectation values <psi| op_i |psi> for all sites at once.

    Returns C scalar per site, [L].  Uses the B-form identity: the left
    environment at site i is diag(lam[i]^2) and everything to the right
    collapses to the identity (right canonicity).  Replaces the reference's
    per-site ``psi.expectation_value`` loop (src/core/observables.py:60-71),
    which rebuilt the operator tensor per call -- here it is one batched
    contraction.
    """
    w = psi.lam[:-1] ** 2  # [L, chi] real
    T = cpx.einsum("pq,laqb->lapb", op, psi.B)
    T2 = cpx.einsum("lapb,lapb->la", psi.B.conj(), T)
    return cpx.einsum("la,la->l", T2, w)


def entanglement_entropy(psi: MPS, eps: float = 1e-30) -> jax.Array:
    """Von Neumann entropy at every bond from the Schmidt values: [L+1].

    Reference: src/core/tensor_utils.py:169-180 (psi.entanglement_entropy()).
    """
    p = psi.lam ** 2
    return -jnp.sum(jnp.where(p > eps, p * jnp.log(p + eps), 0.0), axis=-1)


def entanglement_spectrum(psi: MPS, cut: int) -> jax.Array:
    """Schmidt values at a given cut (bond index). Reference: observables.py:238-251."""
    return psi.lam[cut]


def bond_dimensions(psi: MPS, tol: float = 1e-14) -> jax.Array:
    """Effective (unpadded) bond dimension per bond: count of lam > tol, [L+1]."""
    return jnp.sum(psi.lam > tol, axis=-1)


def max_bond_dimension(psi: MPS, tol: float = 1e-14) -> jax.Array:
    inner = bond_dimensions(psi, tol)[1:-1]
    return jnp.maximum(jnp.max(inner, initial=1), 1)


def to_statevector(psi: MPS) -> np.ndarray:
    """Dense complex statevector [d**L] on host; for tests with small L."""
    L, chi = psi.L, psi.chi
    B = cpx.to_numpy(psi.B)  # [L, chi, d, chi] complex numpy
    vec = np.zeros((1, chi), dtype=complex)
    vec[0, 0] = 1.0
    for i in range(L):
        vec = np.einsum("na,apb->npb", vec, B[i]).reshape(-1, chi)
    return vec[:, 0]


def apply_one_site_gates(psi: MPS, gates: C) -> MPS:
    """Apply a single-site gate per site; gates C[L, d, d] or C[d, d].

    Pure local transform -- no SVD needed (the reference pays a full MPS
    copy plus TeNPy apply_local_op per site here, reference
    src/models/kicked_ising.py:150-160).
    """
    if gates.ndim == 2:
        B = cpx.einsum("pq,laqb->lapb", gates, psi.B)
    else:
        B = cpx.einsum("lpq,laqb->lapb", gates, psi.B)
    return MPS(B=B, lam=psi.lam)
