"""Complex arithmetic as real (re, im) array pairs.

The axon TPU backend implements NO complex dtypes (even ``jnp.ones(...,
complex64)`` is UNIMPLEMENTED) and no SVD -- verified empirically, see
ops/csvd.py.  The entire compute path therefore represents complex tensors
as pairs of real arrays, which is also the faster layout on TPU: every
complex contraction becomes real matmuls the MXU executes natively, with no
complex-lowering in the way.

``C`` is a pytree, so it passes transparently through jit/vmap/scan/
shard_map.  On CPU the same code runs with float64 pairs, giving
complex128-equivalent precision for the 1e-8 parity gates (SURVEY.md
section 7, hard part 2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _coerce(other):
    """Non-C COMPLEX operands -> C.  A complex scalar/array used to fall
    through the real-operand fallback and silently become part of the .re
    field, corrupting the (re, im) invariant (wrong numbers on CPU, a
    delayed UNIMPLEMENTED crash on the complex-free TPU backend).  The
    natural ``psi * (-1j)`` now does the right thing."""
    if isinstance(other, complex):
        return C(jnp.asarray(other.real), jnp.asarray(other.imag))
    dt = getattr(other, "dtype", None)
    if dt is not None and jnp.issubdtype(dt, jnp.complexfloating):
        return C(jnp.real(other), jnp.imag(other))
    return other


class C(NamedTuple):
    """A complex tensor as a (re, im) pair of identically-shaped real arrays."""

    re: jax.Array
    im: jax.Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def ndim(self):
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def __add__(self, other):
        other = _coerce(other)
        if isinstance(other, C):
            return C(self.re + other.re, self.im + other.im)
        return C(self.re + other, self.im)

    def __sub__(self, other):
        other = _coerce(other)
        if isinstance(other, C):
            return C(self.re - other.re, self.im - other.im)
        return C(self.re - other, self.im)

    def __mul__(self, other):
        """Elementwise product; ``other`` may be C, a real array/scalar, or
        a complex scalar/array (coerced to C -- see _coerce)."""
        other = _coerce(other)
        if isinstance(other, C):
            return C(self.re * other.re - self.im * other.im,
                     self.re * other.im + self.im * other.re)
        return C(self.re * other, self.im * other)

    def __truediv__(self, other):
        other = _coerce(other)
        if isinstance(other, C):
            d = other.re * other.re + other.im * other.im
            return C((self.re * other.re + self.im * other.im) / d,
                     (self.im * other.re - self.re * other.im) / d)
        return C(self.re / other, self.im / other)

    # Reflected operators: without these, left-operand arithmetic falls
    # into tuple semantics (``2 * psi`` -> tuple REPETITION (re, im, re,
    # im)) or numpy/jax array coercion -- silent garbage, not an error.
    # Multiplication/addition commute, subtraction reflects via negation.
    def __radd__(self, other):
        return self.__add__(other)

    def __rmul__(self, other):
        return self.__mul__(other)

    def __rsub__(self, other):
        return (-self).__add__(other)

    def __array__(self, dtype=None, copy=None):
        # numpy/jax coercion of a C (e.g. ``jnp_array * psi``: the array's
        # __mul__ wins the dispatch and asarray's the right operand) would
        # silently stack (re, im) into a leading axis-2 real array.  Fail
        # loudly instead; use cpx.to_numpy for an explicit conversion.
        raise TypeError(
            "implicit array conversion of cpx.C is disallowed (it would "
            "stack (re, im) into a real axis and corrupt complex "
            "arithmetic); put the C operand on the LEFT of the operator "
            "or convert explicitly with cpx.to_numpy")

    def __neg__(self):
        return C(-self.re, -self.im)

    def __getitem__(self, idx):
        return C(self.re[idx], self.im[idx])

    def reshape(self, *shape):
        return C(self.re.reshape(*shape), self.im.reshape(*shape))

    def astype(self, dtype):
        return C(self.re.astype(dtype), self.im.astype(dtype))

    def conj(self):
        return C(self.re, -self.im)

    def transpose(self, *axes):
        return C(self.re.transpose(*axes), self.im.transpose(*axes))


def zeros(shape, dtype=jnp.float32) -> C:
    return C(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def abs2(a: C) -> jax.Array:
    """|a|^2 elementwise, real."""
    return a.re * a.re + a.im * a.im


def cabs(a: C) -> jax.Array:
    return jnp.sqrt(abs2(a))


def expi(phi: jax.Array) -> C:
    """e^{i phi} for real phi."""
    return C(jnp.cos(phi), jnp.sin(phi))


def scale_expi(r: jax.Array, phi: jax.Array) -> C:
    """r e^{i phi}."""
    return C(r * jnp.cos(phi), r * jnp.sin(phi))


# Matmul precision for all complex contractions.  On TPU the MXU's default
# is bfloat16 inputs, which loses ~3 decimal digits per contraction and was
# measured to blow up to 1e-2 trace error over 20 Floquet periods; HIGHEST
# (true float32 via multi-pass bf16) restores ~1e-6 at a modest flop cost.
# Override with set_precision('default') for throughput experiments.
_PRECISION = "highest"


def set_precision(p: str) -> None:
    """Set the matmul precision for all subsequent complex contractions.

    _PRECISION is read at TRACE time and is not part of any jit cache key,
    so already-compiled programs would silently keep their old precision;
    clearing the jax caches forces a retrace at the new setting (the next
    call of each program pays one recompile)."""
    global _PRECISION
    _PRECISION = p
    jax.clear_caches()


def einsum(spec: str, *ops) -> C:
    """Complex einsum over C and/or real-array operands.

    Uses the naive 4-multiplication product for two complex operands (XLA
    fuses the adds; Karatsuba saves one multiply but costs extra adds and
    precision).  Operands that are plain real arrays participate directly.
    """
    es = partial(jnp.einsum, precision=_PRECISION)
    if len(ops) == 1:
        (a,) = ops
        if isinstance(a, C):
            return C(es(spec, a.re), es(spec, a.im))
        return es(spec, a)
    if len(ops) != 2:
        # fold left for >2 operands: rely on pairwise application by caller
        raise NotImplementedError("cpx.einsum supports 1 or 2 operands")
    a, b = ops
    a_c, b_c = isinstance(a, C), isinstance(b, C)
    if a_c and b_c:
        rr = es(spec, a.re, b.re)
        ii = es(spec, a.im, b.im)
        ri = es(spec, a.re, b.im)
        ir = es(spec, a.im, b.re)
        return C(rr - ii, ri + ir)
    if a_c:
        return C(es(spec, a.re, b), es(spec, a.im, b))
    if b_c:
        return C(es(spec, a, b.re), es(spec, a, b.im))
    return es(spec, a, b)


def matmul(a: C, b: C) -> C:
    return einsum("...ij,...jk->...ik", a, b)


def to_numpy(a: C) -> np.ndarray:
    """Host-side complex numpy view (tests / analysis)."""
    return np.asarray(a.re) + 1j * np.asarray(a.im)


def from_numpy(x, dtype=jnp.float32) -> C:
    x = np.asarray(x)
    return C(jnp.asarray(x.real, dtype=dtype), jnp.asarray(np.imag(x), dtype=dtype))


def at_set(a: C, idx, val: C) -> C:
    """Functional indexed update: a.at[idx].set(val) for C tensors."""
    return C(a.re.at[idx].set(val.re), a.im.at[idx].set(val.im))


def where(mask, a: C, b: C) -> C:
    return C(jnp.where(mask, a.re, b.re), jnp.where(mask, a.im, b.im))


def stack(xs, axis=0) -> C:
    return C(jnp.stack([x.re for x in xs], axis=axis),
             jnp.stack([x.im for x in xs], axis=axis))


def real_embedding(a: C) -> jax.Array:
    """[[re, -im], [im, re]] block matrix of a [..., n, m] complex tensor:
    returns [..., 2n, 2m] real.  Used by the Gram-eigh SVD path."""
    top = jnp.concatenate([a.re, -a.im], axis=-1)
    bot = jnp.concatenate([a.im, a.re], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
