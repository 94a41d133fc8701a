"""Diagnostic: per-period warm-start leak + effective rank profile.

For each period t of the headline config, compute on-device:
  - S_t (production jacobi_sv spectrum of the even-bond theta batch)
  - effective rank per bond:  #{ sigma_i > 1e-7 sigma_1 }
  - leak vs the previous period's V:  ||M_t||_F^2 - ||M_t V_{t-1}||_F^2
    (the weight a V-warm-started projected SVD would miss, relative)

Decides whether the projected-Jacobi truncation (PAPERS.md QR-TEBD class)
helps the 20-period BENCH window or only the long-run steady state.

Run:  python baselines/proj_leak_profile.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from timecrystal_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from timecrystal_tpu.core.mps import apply_one_site_gates, create_initial_state
from timecrystal_tpu.core.truncate import TruncParams, apply_bond_gates
from timecrystal_tpu.models.kicked_ising import (FloquetGates,
                                                 _square_diagonal_gates,
                                                 draw_disorder_reference,
                                                 make_floquet_gates)
from timecrystal_tpu.ops import cpx
from timecrystal_tpu.ops.pallas.jacobi_svd import jacobi_sv

CFG = dict(L=40, chi=256, theta_frac=0.9, h=0.3, tau=1.0, seed=42)
T_MAX = 60


def build_theta_batch(psi, bond_gates, start):
    L, chi, d, _ = psi.B.re.shape
    idx_np = np.arange(start, L - 1, 2)
    idx = jnp.asarray(idx_np)
    Bl = psi.B[idx]
    Br = psi.B[idx + 1]
    lamL = psi.lam[idx]
    g = bond_gates[idx]
    theta_tilde = cpx.einsum("napb,nbqc->napqc", Bl, Br)
    theta_tilde = cpx.einsum("npqrs,narsc->napqc", g, theta_tilde)
    theta = theta_tilde * lamL[:, :, None, None, None]
    n = len(idx_np)
    return theta.reshape(n, chi * d, d * chi)


def main():
    chi = CFG["chi"]
    h_fields = draw_disorder_reference(CFG["L"], CFG["h"], CFG["seed"])
    gates = make_floquet_gates(1.0, jnp.asarray(h_fields, jnp.float32),
                               CFG["tau"], theta=CFG["theta_frac"] * np.pi,
                               dtype=jnp.float32)
    full = FloquetGates(bond_gates=_square_diagonal_gates(gates.bond_gates),
                        kick=gates.kick)
    psi = create_initial_state(CFG["L"], "neel", chi=CFG["chi"],
                               dtype=jnp.float32)
    tp = TruncParams(chi_max=0, svd_min=1e-7)

    @jax.jit
    def one_period(phi, Vprev):
        phi = apply_one_site_gates(phi, full.kick)
        M = build_theta_batch(phi, full.bond_gates, 0)
        thetaH = cpx.C(jnp.swapaxes(M.re, -1, -2), -jnp.swapaxes(M.im, -1, -2))
        S, V = jacobi_sv(thetaH, polish=chi)
        Vk = cpx.C(V.re[:, :, :chi], V.im[:, :, :chi])
        norm2 = jnp.sum(cpx.abs2(M), axis=(-2, -1))
        MV = cpx.einsum("nij,njk->nik", M, Vprev)
        cap2 = jnp.sum(cpx.abs2(MV), axis=(-2, -1))
        leak = (norm2 - cap2) / jnp.maximum(norm2, 1e-30)
        rank = jnp.sum(S > 1e-7 * S[:, :1], axis=-1)
        # kept-weight fraction below top-chi (true truncation this period)
        disc = jnp.sum(S[:, chi:] ** 2, axis=-1) / jnp.maximum(norm2, 1e-30)
        phi, _ = apply_bond_gates(phi, full.bond_gates, start=0, tp=tp)
        phi, _ = apply_bond_gates(phi, full.bond_gates, start=1, tp=tp)
        return phi, Vk, leak, rank, disc

    nb = len(np.arange(0, CFG["L"] - 1, 2))
    n = 2 * chi
    Vprev = cpx.C(jnp.zeros((nb, n, chi), jnp.float32),
                  jnp.zeros((nb, n, chi), jnp.float32))
    print("t  rank(min/med/max)  leak(med/max)      disc(max)")
    for t in range(T_MAX):
        psi, Vprev, leak, rank, disc = one_period(psi, Vprev)
        lk = np.asarray(leak)
        rk = np.asarray(rank)
        dc = np.asarray(disc)
        if t == 0:
            continue  # leak vs zero-init V is meaningless at t=0
        if t < 10 or t % 5 == 0:
            print(f"{t:3d}  {rk.min():4d}/{int(np.median(rk)):4d}/{rk.max():4d}"
                  f"   {np.median(lk):.2e}/{lk.max():.2e}  {dc.max():.2e}")


if __name__ == "__main__":
    main()
