"""Gate construction: Pauli algebra and analytic Floquet gates.

TPU-first replacement for the reference's scipy.linalg.expm gate builders
(reference src/models/kicked_ising.py:73-98 and src/core/tensor_utils.py:108-142).

Key insight (SURVEY.md section 2.2): the Ising half-step Hamiltonian
J sz sz + h_i sz + h_j sz is *diagonal* in the z basis, so the 4x4 bond gate
is a pure diagonal phase computed with elementwise cos/sin -- no general
matrix exponential is ever needed on the hot path.  The pi-pulse
expm(-i pi/2 sx) is exactly -i * sigma_x (quirk 4).

Device-side gates are C (real-pair) tensors (ops/cpx.py) because the TPU
backend has no complex dtypes; host-side analysis helpers stay complex numpy.

The reference's buggy-and-dead ``create_time_evolution_gates`` (elementwise
np.exp of a non-diagonal matrix, tensor_utils.py:134) is NOT replicated; the
*intended* gate set is provided instead (SURVEY.md quirk 9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cpx
from ..ops.cpx import C

SIGMA_X = np.array([[0, 1], [1, 0]], dtype=np.complex128)
SIGMA_Y = np.array([[0, -1j], [1j, 0]], dtype=np.complex128)
SIGMA_Z = np.array([[1, 0], [0, -1]], dtype=np.complex128)
SIGMA_I = np.eye(2, dtype=np.complex128)


def pauli_matrices() -> dict:
    """Pauli dict, API parity with reference src/core/tensor_utils.py:13-25."""
    return {"I": SIGMA_I.copy(), "X": SIGMA_X.copy(), "Y": SIGMA_Y.copy(), "Z": SIGMA_Z.copy()}


def pauli_c(name: str, dtype=jnp.float32) -> C:
    """Device-side Pauli operator as a C pair."""
    return cpx.from_numpy(pauli_matrices()[name.upper()], dtype=dtype)


def pi_pulse_gate(dtype=jnp.float32) -> C:
    """expm(-i pi/2 sigma_x) == -i sigma_x exactly (reference kicked_ising.py:76)."""
    return C(jnp.zeros((2, 2), dtype), jnp.asarray(-SIGMA_X.real, dtype))


def x_rotation_gate(theta, dtype=jnp.float32) -> C:
    """exp(-i theta/2 sigma_x) analytically (generalized kick for imperfect pulses)."""
    theta = jnp.asarray(theta, dtype)
    c, s = jnp.cos(theta / 2), jnp.sin(theta / 2)
    eye = jnp.eye(2, dtype=dtype)
    sx = jnp.asarray(SIGMA_X.real, dtype)
    return C(c * eye, -s * sx)


def ising_bond_phase_angles(J, h_fields: jax.Array, tau_half) -> jax.Array:
    """Phase angles -tau_half * E of the per-bond Ising half-step gates.

    Gate on bond b (sites b, b+1):
        exp(-i tau_half (J sz sz + h_b sz x I + h_{b+1} I x sz))
    with the reference's field double-counting kept exactly: every bond gate
    carries the FULL h_i and h_{i+1}, so interior sites see 2 h_i per
    half-step (reference kicked_ising.py:83-85, SURVEY.md quirk 2).

    Returns [L-1, 4] real angles over the basis order
    (s_b, s_{b+1}) = (+,+), (+,-), (-,+), (-,-)  [index p: s = 1 - 2p].
    """
    h = jnp.asarray(h_fields)
    hl, hr = h[:-1], h[1:]                      # [L-1]
    s = jnp.asarray([1.0, -1.0], dtype=h.dtype)
    s1 = jnp.repeat(s, 2)                       # [+ + - -]
    s2 = jnp.tile(s, 2)                         # [+ - + -]
    E = (J * s1 * s2)[None, :] + hl[:, None] * s1[None, :] + hr[:, None] * s2[None, :]
    return -tau_half * E


def phases_to_bond_gates(angles: jax.Array, dtype=jnp.float32) -> C:
    """Embed diagonal phase angles [n, d*d] as dense gates C[n, d, d, d, d].

    The theta-gate contraction cost is negligible next to the SVD, so the
    generic dense-gate path keeps one code path for arbitrary gates while
    the Ising gates stay analytically exact.
    """
    n, dd = angles.shape
    d = int(round(np.sqrt(dd)))
    eye = jnp.eye(dd, dtype=dtype)
    ph = cpx.expi(angles.astype(dtype))
    re = (ph.re[:, :, None] * eye[None]).reshape(n, d, d, d, d)
    im = (ph.im[:, :, None] * eye[None]).reshape(n, d, d, d, d)
    return C(re, im)


def gate_from_numpy(U: np.ndarray, dtype=jnp.float32) -> C:
    """Dense complex gate (host numpy) -> device C tensor."""
    return cpx.from_numpy(np.asarray(U), dtype=dtype)


def two_site_hamiltonian(J, h_left, h_right) -> np.ndarray:
    """Dense 4x4 bond Hamiltonian J ZZ + h_l Z x I + h_r I x Z (host-side,
    analysis/parity checks; reference kicked_ising.py:82-85)."""
    return (J * np.kron(SIGMA_Z, SIGMA_Z)
            + h_left * np.kron(SIGMA_Z, SIGMA_I)
            + h_right * np.kron(SIGMA_I, SIGMA_Z))


def expm_two_site(H: np.ndarray, t: float) -> np.ndarray:
    """Host-side expm(-i t H) fallback for generic (non-diagonal) bond terms,
    used by the generic Suzuki-Trotter TEBD path (dynamics/tebd.py)."""
    import scipy.linalg

    return scipy.linalg.expm(-1j * t * H)


def create_time_evolution_gates(J: float, h: float, tau: float, n_sites: int) -> dict:
    """API-parity port of reference tensor_utils.py:108-142 with the intended
    (not buggy) semantics: a true matrix exponential of the two-site
    Hamiltonian plus the exact pi-pulse (SURVEY.md quirk 9)."""
    H = two_site_hamiltonian(J, h, h)
    return {
        "ising_evolution": expm_two_site(H, tau),
        "pi_pulse": np.asarray(-1j * SIGMA_X),
    }
