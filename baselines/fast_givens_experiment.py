"""Experiment: square-root-deferred (fast-Givens) rotations in the V-free
Jacobi sweep kernel.

Both rotated columns of a pair scale by the SAME cs, so cs can be deferred
into per-column scale factors d (cheap [G, k] updates), cutting the
per-element rotation from 12 FMAs to 8:
    u' = u - p . v,   v' = v + conj(p) . u,   d_u' = cs d_u, d_v' = cs d_v
with p = t * conj(ph) * (d_v / d_u) folding the scale ratio.  Column norms
(a, b) are carried as TRUE values; the fresh inner product c~ on scaled
data converts via c = d_u d_v c~.  cs >= 1/sqrt(2) per rotation, so scales
shrink at most (1/sqrt 2)^steps: rescaling every 73 steps (7 chunks per
511-step sweep) keeps d >= 1e-11, far from f32 underflow, at ~3% cost.

Run on the real TPU: speed vs the production sweep kernel and S/V accuracy
vs LAPACK on captured L=40 thetas.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fast_sweep_kernel(n: int, chunk: int = 73):
    k = n // 2
    steps = n - 1
    n_chunks = -(-steps // chunk)

    def kernel(in_re, in_im, A_re_ref, A_im_ref, off2_ref, ab_ref, d_ref):
        A_re_ref[:] = in_re[:]
        A_im_ref[:] = in_im[:]
        G = A_re_ref.shape[0]
        ab_ref[:, 0, :] = jnp.sum(A_re_ref[:, :, :k] ** 2
                                  + A_im_ref[:, :, :k] ** 2, axis=1)
        ab_ref[:, 1, :] = jnp.sum(A_re_ref[:, :, k:] ** 2
                                  + A_im_ref[:, :, k:] ** 2, axis=1)
        ab_ref[:, 2, :] = jnp.zeros_like(ab_ref[:, 2, :])
        maxn2 = jnp.max(jnp.maximum(ab_ref[:, 0, :], ab_ref[:, 1, :]),
                        axis=1, keepdims=True)
        inv_maxn2_sq = 1.0 / jnp.maximum(maxn2 * maxn2, 1e-30)
        # d_ref rows: 0 = dL, 1 = dR (true column scale factors)
        d_ref[:, 0, :] = jnp.ones_like(d_ref[:, 0, :])
        d_ref[:, 1, :] = jnp.ones_like(d_ref[:, 1, :])

        def step(t, _):
            L_re, L_im = A_re_ref[:, :, :k], A_im_ref[:, :, :k]
            R_re, R_im = A_re_ref[:, :, k:], A_im_ref[:, :, k:]
            a = ab_ref[:, 0, :]
            b = ab_ref[:, 1, :]
            dL = d_ref[:, 0, :]
            dR = d_ref[:, 1, :]
            ct_re = jnp.sum(L_re * R_re + L_im * R_im, axis=1)  # scaled c~
            ct_im = jnp.sum(L_re * R_im - L_im * R_re, axis=1)
            dLR = dL * dR
            abs2c = (ct_re * ct_re + ct_im * ct_im) * (dLR * dLR)  # true |c|^2
            ab_ref[:, 2, :] = jnp.maximum(ab_ref[:, 2, :],
                                          abs2c * inv_maxn2_sq)
            absc = jnp.sqrt(abs2c)
            safe = absc > 1e-30
            tau = jnp.where(safe, (b - a) / jnp.maximum(2 * absc, 1e-30), 0.0)
            t_ = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
            t_ = jnp.where(safe, t_, 0.0)
            cs = 1.0 / jnp.sqrt(1 + t_ * t_)
            # ph from scaled c~ (positive scales cancel in the phase)
            absct = jnp.sqrt(ct_re * ct_re + ct_im * ct_im)
            ph_re = jnp.where(safe, ct_re / jnp.maximum(absct, 1e-30), 1.0)
            ph_im = jnp.where(safe, ct_im / jnp.maximum(absct, 1e-30), 0.0)
            # p = t * conj(ph) * dR/dL ; q = t * ph * dL/dR
            rLR = jnp.where(dL > 0, dR / jnp.maximum(dL, 1e-30), 0.0)
            rRL = jnp.where(dR > 0, dL / jnp.maximum(dR, 1e-30), 0.0)
            p_re, p_im = t_ * ph_re * rLR, -t_ * ph_im * rLR
            q_re, q_im = t_ * ph_re * rRL, t_ * ph_im * rRL
            p_re_b, p_im_b = p_re[:, None, :], p_im[:, None, :]
            q_re_b, q_im_b = q_re[:, None, :], q_im[:, None, :]
            XL_re = L_re - (p_re_b * R_re - p_im_b * R_im)
            XL_im = L_im - (p_re_b * R_im + p_im_b * R_re)
            XR_re = R_re + (q_re_b * L_re - q_im_b * L_im)
            XR_im = R_im + (q_re_b * L_im + q_im_b * L_re)
            a_new = a - t_ * absc
            b_new = b + t_ * absc
            dL_new = dL * cs
            dR_new = dR * cs
            A_re_ref[:, :, :k] = jnp.concatenate(
                [XL_re[:, :, :1], XR_re[:, :, :1], XL_re[:, :, 1:k - 1]],
                axis=2)
            A_im_ref[:, :, :k] = jnp.concatenate(
                [XL_im[:, :, :1], XR_im[:, :, :1], XL_im[:, :, 1:k - 1]],
                axis=2)
            A_re_ref[:, :, k:] = jnp.concatenate(
                [XR_re[:, :, 1:], XL_re[:, :, k - 1:]], axis=2)
            A_im_ref[:, :, k:] = jnp.concatenate(
                [XR_im[:, :, 1:], XL_im[:, :, k - 1:]], axis=2)
            ab_ref[:, 0, :] = jnp.concatenate(
                [a_new[:, :1], b_new[:, :1], a_new[:, 1:k - 1]], axis=1)
            ab_ref[:, 1, :] = jnp.concatenate(
                [b_new[:, 1:], a_new[:, k - 1:]], axis=1)
            d_ref[:, 0, :] = jnp.concatenate(
                [dL_new[:, :1], dR_new[:, :1], dL_new[:, 1:k - 1]], axis=1)
            d_ref[:, 1, :] = jnp.concatenate(
                [dR_new[:, 1:], dL_new[:, k - 1:]], axis=1)
            return 0

        done = 0
        for c in range(n_chunks):
            lo = c * chunk
            hi = min((c + 1) * chunk, steps)
            jax.lax.fori_loop(lo, hi, step, 0)
            # fold scales back into the columns (d >= (1/sqrt2)^chunk)
            A_re_ref[:, :, :k] = A_re_ref[:, :, :k] * d_ref[:, 0, :][:, None, :]
            A_im_ref[:, :, :k] = A_im_ref[:, :, :k] * d_ref[:, 0, :][:, None, :]
            A_re_ref[:, :, k:] = A_re_ref[:, :, k:] * d_ref[:, 1, :][:, None, :]
            A_im_ref[:, :, k:] = A_im_ref[:, :, k:] * d_ref[:, 1, :][:, None, :]
            d_ref[:, 0, :] = jnp.ones_like(d_ref[:, 0, :])
            d_ref[:, 1, :] = jnp.ones_like(d_ref[:, 1, :])
            done = hi

        off2 = jnp.max(ab_ref[:, 2, :]).astype(jnp.float32)
        off2_ref[0, :, :] = jnp.full((8, 128), off2, dtype=jnp.float32)

    return kernel


_CALL_CACHE = {}


def _get_call(Bn, m, n, G):
    key = (Bn, m, n, G)
    if key in _CALL_CACHE:
        return _CALL_CACHE[key]
    kernel = fast_sweep_kernel(n)
    n_blocks = Bn // G
    block = pl.BlockSpec((G, m, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    off2_spec = pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    call = jax.jit(pl.pallas_call(
        kernel, grid=(n_blocks,),
        out_shape=[jax.ShapeDtypeStruct((Bn, m, n), jnp.float32),
                   jax.ShapeDtypeStruct((Bn, m, n), jnp.float32),
                   jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.float32)],
        in_specs=[block, block], out_specs=[block, block, off2_spec],
        input_output_aliases={0: 0, 1: 1},
        scratch_shapes=[pltpu.VMEM((G, 3, n // 2), jnp.float32),
                        pltpu.VMEM((G, 2, n // 2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)))
    _CALL_CACHE[key] = call
    return call


def run_fast_sweeps(re, im, n_sweeps, G=5):
    Bn, m, n = re.shape
    call = _get_call(Bn, m, n, G)
    for _ in range(n_sweeps):
        re, im, off2 = call(re, im)
    return re, im, off2


if __name__ == "__main__":
    d = np.load("/tmp/theta_L40.npz")
    A = (d["re"] + 1j * d["im"]).transpose(0, 2, 1).conj()   # theta^H
    Sref = np.linalg.svd(d["re"] + 1j * d["im"],
                         compute_uv=False).astype(np.float32)
    re0 = jnp.asarray(A.real.astype(np.float32))
    im0 = jnp.asarray(A.imag.astype(np.float32))

    # accuracy trajectory
    re, im = re0, im0
    for s in range(12):
        re, im, off2 = run_fast_sweeps(re, im, 1)
        B = np.asarray(re) + 1j * np.asarray(im)
        S = np.sort(np.sqrt((np.abs(B) ** 2).sum(axis=1)), axis=-1)[:, ::-1]
        err = np.max(np.abs(S - Sref)) / Sref.max()
        print(f"sweep {s+1}: off2={float(np.max(np.asarray(off2))):.3e} "
              f"S err={err:.2e}")

    # timing: 10 consecutive sweeps in one fetch
    def timed(nsw):
        t0 = time.perf_counter()
        r, i, o = run_fast_sweeps(re0, im0, nsw)
        np.asarray(o[0, 0, 0])
        return time.perf_counter() - t0

    timed(10)
    ts = [timed(10) for _ in range(3)]
    print(f"fast-Givens: {min(ts)/10*1e3:.2f} ms/sweep (20 matrices)")
