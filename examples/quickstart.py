#!/usr/bin/env python3
"""Quickstart: simulate a disordered discrete time crystal and detect the
period-doubling signature.  Runs on TPU (default) or CPU.

    python examples/quickstart.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timecrystal_tpu.utils.backend import ensure_responsive_backend

ensure_responsive_backend()      # wedged/absent TPU worker -> CPU fallback

from timecrystal_tpu.analysis.detection import stringent_dtc_detection
from timecrystal_tpu.core import observables as obs
from timecrystal_tpu.core.mps import create_initial_state
from timecrystal_tpu.core.truncate import TruncParams
from timecrystal_tpu.dynamics import CustomFloquet
from timecrystal_tpu.models import KickedIsingModel
from timecrystal_tpu.utils.cache import enable_compilation_cache


def main() -> None:
    enable_compilation_cache()

    # disordered kicked-Ising chain with a slightly imperfect pi pulse
    # (theta != pi makes the dynamics genuinely entangling)
    model = KickedIsingModel(n_sites=20, J=1.0, h_disorder=0.3, tau=1.0,
                             disorder_seed=42, chi=64, theta=0.97 * np.pi)
    psi0 = create_initial_state(20, "neel", chi=64)

    flo = CustomFloquet(model, TruncParams(chi_max=64, svd_min=1e-7))
    traces, times, info = flo.evolve_floquet_traces(psi0, n_periods=100)

    period = 2 * model.tau
    a2t = obs.extract_subharmonic_amplitude(
        np.asarray(times), traces["staggered_magnetization"], period)
    dtc_score = stringent_dtc_detection(traces["loschmidt_echo"], times, period)

    print(f"throughput:            {info['periods_per_second']:.1f} periods/s")
    print(f"final max bond dim:    {info['final_bond_dim']}")
    print(f"subharmonic A2T:       {a2t:.3f}   (DTC if ~1)")
    print(f"stringent DTC score:   {dtc_score:.3f} (threshold 0.3)")
    print(f"staggered magnetization, first 6 periods: "
          f"{np.round(traces['staggered_magnetization'][:6], 3)}")

    ensemble()


def ensemble() -> None:
    """Disorder ensemble, the production path: R realizations evolve as ONE
    chi-staged vmapped program (pad small, escalate only when a chunk
    truncates real weight), with per-realization A2T read off on device."""
    import jax
    import jax.numpy as jnp

    from timecrystal_tpu.parallel import SweepSpec, evolve_batch_auto
    from timecrystal_tpu.parallel.sweep import _basis_indices, ensemble_a2t
    from timecrystal_tpu.models.kicked_ising import draw_disorder_batch

    R, L = 8, 20
    spec = SweepSpec(L=L, chi=64, n_periods=60, theta=0.97 * float(np.pi),
                     tp=TruncParams(chi_max=0, svd_min=1e-7),
                     dtype="float32", frame="merged")
    h = draw_disorder_batch(jax.random.PRNGKey(0), R, L, 0.3)
    taus = jnp.full((R,), 1.0)
    basis = jnp.asarray(_basis_indices(L, "neel"))
    # cap_svd_method: once the chi ladder is pinned at the cap (escalation
    # over), chunks route to the core-matrix projected SVD -- the adopted
    # saturated-steady-state production knob (~5x the full kernel,
    # PERFORMANCE.md round-3; trunc_err traces of cap chunks carry its
    # measurement noise floor).  TPU-only here: on the CPU fallback the
    # Pallas kernel runs in slow interpret mode, so plain LAPACK is the
    # right cap path there.
    cap_method = "jacobi_core" if jax.default_backend() != "cpu" else None
    traces, info = evolve_batch_auto(h, taus, basis, spec, chi_start=16,
                                     chunk_periods=10,
                                     cap_svd_method=cap_method)
    a2t = np.asarray(ensemble_a2t(traces, taus))
    print(f"\nensemble of {R} disorder realizations "
          f"({info['chain_periods_per_second']:.0f} chain-periods/s, "
          f"chi staged to {info['chi_pad_used']}):")
    print(f"A2T per realization: {np.round(a2t, 3)}")

    correlator_map()


def correlator_map() -> None:
    """Disorder-averaged C(r, t) = mean_h <sz_i sz_j(t)> from a central
    anchor, measured IN-SCAN for the whole ensemble (no state histories --
    the reference must materialize every state per realization for this)."""
    import jax
    import jax.numpy as jnp

    from timecrystal_tpu.models.kicked_ising import draw_disorder_batch
    from timecrystal_tpu.parallel import SweepSpec, evolve_batch
    from timecrystal_tpu.parallel.sweep import _basis_indices

    R, L, site = 8, 12, 6
    spec = SweepSpec(L=L, chi=32, n_periods=20, theta=0.97 * float(np.pi),
                     tp=TruncParams(chi_max=0, svd_min=1e-7),
                     dtype="float32")
    h = draw_disorder_batch(jax.random.PRNGKey(1), R, L, 0.3)
    tr = evolve_batch(h, jnp.full((R,), 1.0),
                      jnp.asarray(_basis_indices(L, "neel")), spec,
                      correlation_site=site, two_time_anchor=site)
    c_rt = np.asarray(tr["zz_corr"]).mean(axis=0)     # [n+1, L]
    print(f"\ndisorder-averaged C(r, t) from site {site} "
          f"(rows t=0, 10, 20 periods):")
    for t in (0, 10, 20):
        print(f"  t={t:2d}: {np.round(c_rt[t], 2)}")

    # momentum-resolved readout: the DTC peak of S(k, omega) sits at
    # k = pi (staggered order) and the bin closest to half the drive
    # frequency (period doubling).  The TWO-TIME map <sz_i(0) sz_j(t)>
    # (two_time_anchor above, evolved in the same batched program) carries
    # the subharmonic at O(1) weight -- the equal-time map is nearly
    # static in a DTC since both spins flip together.
    from timecrystal_tpu.core.observables import dynamic_structure_factor

    tau = 1.0
    c2t = np.asarray(tr["zz2t_re"]).mean(axis=0)      # [n+1, L]
    times = np.arange(1, c2t.shape[0]) * 2 * tau
    freqs, ks, S = dynamic_structure_factor(times, c2t[1:])
    fi, ki = np.unravel_index(np.argmax(np.asarray(S)), S.shape)
    print(f"S(k, omega) peak of the disorder-averaged two-time C(r, t): "
          f"k = {ks[ki]:.3f} (pi = {np.pi:.3f}), f = {freqs[fi]:.3f} "
          f"(top bin below f_drive/2 = {1 / (4 * tau):.3f})")

    interaction_range()


def interaction_range() -> None:
    """The interaction-range axis (reference-abstract-promised,
    reference-code-absent): power-law J/r^alpha couplings via an FSM MPO
    + TDVP Floquet stepping.  Trapped-ion DTCs live at alpha ~ 0.5-1.8."""
    from timecrystal_tpu.models.long_range import scan_interaction_range

    out = scan_interaction_range([1.0, 1.5, None], L=10, h_disorder=0.25,
                                 tau=2.0, theta=0.97 * np.pi, n_periods=16,
                                 n_realizations=2, chi=32, substeps=2)
    print("\nsubharmonic A2T vs interaction range (None = nearest-neighbor):")
    for a, v, s in zip(out["alphas"], out["a2t"], out["a2t_std"]):
        label = "inf (NN)" if a is None else f"{a:.1f}"
        print(f"  alpha = {label:8s}: A2T = {v:.3f} +- {s:.3f}")

    memory_lifetime()


def memory_lifetime() -> None:
    """DTC as a quantum memory (the reference abstract's end goal): how
    long does the stored Ising bit survive dephasing, vs the bare qubit's
    T2 = 1/(2 gamma)?  One chunked (gamma x trajectory) device program."""
    from timecrystal_tpu.analysis.memory import scan_memory_lifetime

    res = scan_memory_lifetime([0.01, 0.05], L=10, h_over_J=0.3, eps=0.04,
                               n_periods=40, n_trajectories=8, chi=24)
    print("\nDTC memory lifetime vs dephasing (L=10, eps=0.04):")
    for g, tb, t2 in zip(res["gammas"], res["tau_bit"], res["t2_qubit"]):
        print(f"  gamma = {g:.3f}: stored-bit tau = {tb:8.1f} J^-1,  "
              f"bare-qubit T2 = {t2:6.1f} J^-1  "
              f"(protection x{tb / t2:.0f})")


if __name__ == "__main__":
    main()
