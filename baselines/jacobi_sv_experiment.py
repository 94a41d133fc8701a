"""Experiment: V-accumulation-free one-sided Jacobi (transpose trick).

The TEBD two-site update consumes only (S, V) -- never U (core/truncate.py
uses S_top, Vh_top, theta_tilde).  SVD(theta^H) = V S U^H, so one-sided
Jacobi on A = theta^H yields V as the NORMALIZED ROTATED COLUMNS directly:
no V-accumulator in the kernel at all.  This halves the rotation flops for
square thetas (the kernel currently rotates A [m,n] and V [n,n] every step)
and halves VMEM per matrix (bigger G batching).

Run on the real TPU to measure speed + accuracy vs the production kernel.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.cpx import C


def _jacobi_sv_kernel(n: int, n_sweeps: int):
    """Rotate-A-only kernel over refs [G, m, n] (no V accumulation)."""
    k = n // 2

    def kernel(th_re_ref, th_im_ref, A_re_ref, A_im_ref):
        A_re_ref[:] = th_re_ref[:]
        A_im_ref[:] = th_im_ref[:]

        def step(t, _):
            L_re, L_im = A_re_ref[:, :, :k], A_im_ref[:, :, :k]
            R_re, R_im = A_re_ref[:, :, k:], A_im_ref[:, :, k:]
            a = jnp.sum(L_re * L_re + L_im * L_im, axis=1)
            b = jnp.sum(R_re * R_re + R_im * R_im, axis=1)
            c_re = jnp.sum(L_re * R_re + L_im * R_im, axis=1)
            c_im = jnp.sum(L_re * R_im - L_im * R_re, axis=1)
            absc = jnp.sqrt(c_re * c_re + c_im * c_im)
            safe = absc > 1e-30
            tau = jnp.where(safe, (b - a) / jnp.maximum(2 * absc, 1e-30), 0.0)
            t_ = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
            t_ = jnp.where(safe, t_, 0.0)
            cs = 1.0 / jnp.sqrt(1 + t_ * t_)
            sn = cs * t_
            ph_re = jnp.where(safe, c_re / jnp.maximum(absc, 1e-30), 1.0)
            ph_im = jnp.where(safe, c_im / jnp.maximum(absc, 1e-30), 0.0)
            w1_re, w1_im = sn * ph_re, -sn * ph_im
            w2_re, w2_im = sn * ph_re, sn * ph_im
            cs_b = cs[:, None, :]
            w1_re_b, w1_im_b = w1_re[:, None, :], w1_im[:, None, :]
            w2_re_b, w2_im_b = w2_re[:, None, :], w2_im[:, None, :]
            u_re, u_im = L_re, L_im
            XL_re = cs_b * u_re - (w1_re_b * R_re - w1_im_b * R_im)
            XL_im = cs_b * u_im - (w1_re_b * R_im + w1_im_b * R_re)
            XR_re = (w2_re_b * u_re - w2_im_b * u_im) + cs_b * R_re
            XR_im = (w2_re_b * u_im + w2_im_b * u_re) + cs_b * R_im
            # rotate + tournament cycle fused on values
            A_re_ref[:, :, :k] = jnp.concatenate(
                [XL_re[:, :, :1], XR_re[:, :, :1], XL_re[:, :, 1:k - 1]], axis=2)
            A_im_ref[:, :, :k] = jnp.concatenate(
                [XL_im[:, :, :1], XR_im[:, :, :1], XL_im[:, :, 1:k - 1]], axis=2)
            A_re_ref[:, :, k:] = jnp.concatenate(
                [XR_re[:, :, 1:], XL_re[:, :, k - 1:]], axis=2)
            A_im_ref[:, :, k:] = jnp.concatenate(
                [XR_im[:, :, 1:], XL_im[:, :, k - 1:]], axis=2)
            return 0

        jax.lax.fori_loop(0, n_sweeps * (n - 1), step, 0)

    return kernel


@partial(jax.jit, static_argnames=("n_sweeps", "g_cap", "interpret"))
def jacobi_sv(theta: C, n_sweeps: int = 6, g_cap: int = 8,
              interpret: bool = False):
    """(S, V) of square theta C[B, n, n]: kernel runs on theta^H, V read as
    the normalized rotated columns."""
    squeeze = theta.ndim == 2
    if squeeze:
        theta = C(theta.re[None], theta.im[None])
    Bn0, m, n = theta.re.shape
    assert m == n and n % 2 == 0
    # A = theta^H
    A = C(jnp.swapaxes(theta.re, -1, -2), -jnp.swapaxes(theta.im, -1, -2))

    per_mat_bytes = (4 * m * n) * np.dtype(theta.dtype).itemsize
    G = max(1, min(Bn0, int((40 * 2**20) // max(per_mat_bytes, 1))))
    G = min(G, g_cap)
    pad = (-Bn0) % G
    if pad:
        A = C(jnp.concatenate([A.re, jnp.zeros((pad, m, n), theta.dtype)]),
              jnp.concatenate([A.im, jnp.zeros((pad, m, n), theta.dtype)]))
    Bn = Bn0 + pad

    kernel = _jacobi_sv_kernel(n, n_sweeps)
    out_shape = [jax.ShapeDtypeStruct((Bn, m, n), theta.dtype),
                 jax.ShapeDtypeStruct((Bn, m, n), theta.dtype)]
    block = pl.BlockSpec((G, m, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    B_re, B_im = pl.pallas_call(
        kernel, grid=(Bn // G,), out_shape=out_shape,
        in_specs=[block, block], out_specs=[block, block],
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(A.re, A.im)
    if pad:
        B_re, B_im = B_re[:Bn0], B_im[:Bn0]
    Bm = C(B_re, B_im)                                  # = V S
    S = jnp.sqrt(jnp.sum(cpx.abs2(Bm), axis=-2))
    order = jnp.argsort(-S, axis=-1)
    S = jnp.take_along_axis(S, order, axis=-1)
    Bm = C(jnp.take_along_axis(Bm.re, order[:, None, :], axis=-1),
           jnp.take_along_axis(Bm.im, order[:, None, :], axis=-1))
    inv = jnp.where(S > 1e-30, 1.0 / jnp.maximum(S, 1e-30), 0.0)
    V = C(Bm.re * inv[:, None, :], Bm.im * inv[:, None, :])
    if squeeze:
        S, V = S[0], V[0]
    return S, V


if __name__ == "__main__":
    from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_svd

    rng = np.random.RandomState(0)
    B, m, n = 20, 512, 512
    th = C(jnp.asarray(rng.randn(B, m, n), jnp.float32) / np.sqrt(m),
           jnp.asarray(rng.randn(B, m, n), jnp.float32) / np.sqrt(m))

    def timeit(f, fetch):
        _ = fetch(f())
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fetch(f())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for sweeps in (6, 4):
        t_old = timeit(jax.jit(lambda t=th, s=sweeps: jacobi_svd(t, n_sweeps=s)),
                       lambda o: np.asarray(o[1]))
        for g_cap in (4, 8, 10):
            t_new = timeit(
                jax.jit(lambda t=th, s=sweeps, g=g_cap: jacobi_sv(t, n_sweeps=s, g_cap=g)),
                lambda o: np.asarray(o[0]))
            print(f"sweeps={sweeps} g_cap={g_cap}: old {t_old*1e3:.1f} ms  "
                  f"sv-only {t_new*1e3:.1f} ms  ({t_old/t_new:.2f}x)")

    # accuracy on random matrices (12 sweeps to full convergence)
    S_new, V_new = jacobi_sv(th, n_sweeps=12)
    U, S_old, Vh_old = jacobi_svd(th, n_sweeps=12)
    print("max |S diff| =", float(jnp.max(jnp.abs(S_new - S_old))))
    # reconstruction: theta V = U S  =>  || theta V - (theta V) || via norms
    P = cpx.einsum("bij,bjk->bik", th, V_new)
    S_chk = jnp.sqrt(jnp.sum(cpx.abs2(P), axis=-2))
    print("max |S via thetaV| err =", float(jnp.max(jnp.abs(S_chk - S_old))))
    # orthonormality of V
    G = cpx.einsum("bji,bjk->bik", V_new.conj(), V_new)
    eye = jnp.eye(n)[None]
    print("V ortho defect =", float(jnp.max(jnp.abs(G.re - eye))),
          float(jnp.max(jnp.abs(G.im))))
