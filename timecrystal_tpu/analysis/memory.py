"""DTC-as-quantum-memory lifetime analysis.

The reference frames its whole codebase as a study of DTCs as passively
protected quantum memories and promises to "set the stage to model their
coherence lifetimes" (/root/reference/README.md:17, abstract) -- but no
reference code computes a lifetime.  This module closes that gap
TPU-first: chunked vmapped device programs (one shared compiled shape)
evolve the full (gamma x disorder realization x trajectory) ensemble of
stochastic dephasing channels
(dynamics/open_system._evolve_stochastic_scan) and extract

  * ``tau_bit(gamma)``: lifetime of the CLASSICAL Ising bit stored in
    the period-doubled response -- log-linear fit of the sign-corrected
    stroboscopic staggered-magnetization envelope.
  * ``T2(gamma)``: per-qubit coherence time of an undriven |+x> product
    state under the same channel.  The channel average is analytic,
    E[<sx>](t) = e^{-2 gamma t} (tests/test_open_system.py), so the
    fitted T2 must come out 1/(2 gamma) -- the calibration anchor.

In the DTC phase tau_bit >> T2: the drive + interactions + disorder
protect the stored bit far beyond the bare qubit coherence time.  At an
EXACT pi pulse the protection is perfect -- every element of the Floquet
map takes z-basis states to z-basis states, so dephasing phases never
reach <sigma_z> and the envelope does not decay at any gamma; a finite
pulse imperfection eps = 1 - theta/pi opens the channel's path into the
stored bit, and tau_bit(gamma, eps) is the memory figure of merit.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..utils.backend import auto_chunk_rows as _auto_chunk

__all__ = ["memory_envelope", "fit_memory_lifetime", "scan_memory_lifetime",
           "scan_memory_vs_eps", "generate_memory_figure"]


def memory_envelope(staggered: np.ndarray, normalize: bool = True
                    ) -> np.ndarray:
    """Sign-corrected stroboscopic envelope of the period-doubled response.

    ``staggered``: [..., n] staggered-magnetization trace recorded AFTER
    each Floquet period p = 1..n (the open_system/tebd trace convention:
    no t=0 row).  The subharmonic alternates sign each period, so
    env[p-1] = (-1)^p * staggered[p-1]; ``normalize`` divides by the
    first period's magnitude so a perfect DTC sits at env == 1.
    """
    s = np.asarray(staggered, float)
    n = s.shape[-1]
    signs = np.where((np.arange(1, n + 1) % 2) == 0, 1.0, -1.0)
    env = s * signs
    if normalize:
        ref = np.abs(env[..., :1])
        env = env / np.where(ref > 1e-12, ref, 1.0)
    return env


def fit_memory_lifetime(times, envelope, floor: float = 0.05,
                        min_points: int = 4) -> float:
    """Lifetime tau from a log-linear fit of a decaying envelope.

    Fits log(env) = a - t/tau over the CONTIGUOUS PREFIX of samples
    before the first crossing below ``floor`` (past it the ensemble mean
    is noise-dominated and the log fit would be biased -- see inline
    note).  Returns np.inf when the envelope does not decay (slope >= 0),
    the first-crossing time when it decays within ``min_points`` samples
    (fast loss), and np.nan when the trace is unusable (non-finite
    everywhere).
    """
    t = np.asarray(times, float)
    env = np.asarray(envelope, float)
    if not np.any(np.isfinite(env)):
        return float("nan")
    good = np.isfinite(env) & (env > floor)
    # fit ONLY the contiguous prefix before the first floor crossing: past
    # it the ensemble mean fluctuates around zero and keeping the noisy
    # POSITIVE excursions (a plain env > floor mask) biases the tail up,
    # flattening the fitted slope (measured 4x on the e^{-2 gamma t}
    # anchor at 16 trajectories)
    n_head = int(np.argmax(~good)) if np.any(~good) else env.size
    if n_head < int(min_points):
        # decayed below the floor almost immediately (fast loss)
        return float(t[max(n_head - 1, 0)]) if n_head > 0 else 0.0
    tm, em = t[:n_head], env[:n_head]
    slope, _ = np.polyfit(tm, np.log(em), 1)
    if slope >= -1e-12:
        return float("inf")
    return float(-1.0 / slope)




def _chunked_vmap(row_fn, arrays, chunk_size: int, mesh=None,
                  axis_name: str = "batch", checkpointer=None) -> Dict:
    """jax.vmap(row_fn) over equal-leading-axis ``arrays``, in chunks of one
    shared padded program shape; returns the stacked host trace dict.

    The chunking exists for the axon TPU worker's program-size limit
    (same failure class and mitigation as analysis.phase_diagram's grid
    sweeps: a single 192-row L=16 chi=48 program kernel-faults the
    worker, measured).  Rows are position-independent (each carries its
    own PRNG key / parameters), so chunked == single-program bit-exactly.
    Padded tail/mesh rows are duplicates of row 0, sliced off after the
    device fetch.  ``chunk_size=0`` forces one program.

    ``checkpointer`` (a utils.checkpoint.SweepCheckpointer): per-chunk
    persistence -- completed chunks load from disk, only the remainder
    evolves (kill-and-resume for long production sweeps; same contract
    as analysis.phase_diagram.sweep_phase_grid's chunked path).
    """
    import jax
    import jax.numpy as jnp

    if int(chunk_size) < 0:
        raise ValueError(f"chunk_size must be >= 0, got {chunk_size}")
    if int(arrays[0].shape[0]) == 0:
        # an empty axis would otherwise surface as an opaque IndexError on
        # parts[0] after the (empty) chunk loop
        raise ValueError("empty batch: the leading axis of the sweep arrays "
                         "(gammas/eps_values x realizations x trajectories) "
                         "has zero rows")

    def _pad(chunk, n):
        return [jnp.concatenate([c, jnp.tile(c[:1], (n,) + (1,) *
                                             (c.ndim - 1))])
                for c in chunk]

    B = int(arrays[0].shape[0])
    cs = int(chunk_size) if chunk_size else B
    done = checkpointer.completed_chunks() if checkpointer is not None \
        else set()
    parts = []
    for ci, lo in enumerate(range(0, B, cs)):
        hi = min(lo + cs, B)
        if ci in done:
            parts.append(checkpointer.load_chunk(ci))
            continue
        chunk = [a[lo:hi] for a in arrays]
        if hi - lo < cs:                 # ragged tail: pad so every chunk
            chunk = _pad(chunk, cs - (hi - lo))  # reuses one program
        if mesh is not None:
            from ..parallel.sweep import _mesh_place

            pad_m = (-int(chunk[0].shape[0])) % mesh.devices.size
            if pad_m:
                chunk = _pad(chunk, pad_m)
            place = _mesh_place(mesh, axis_name)
            chunk = [place(c) for c in chunk]
        tr = jax.vmap(row_fn)(*chunk)
        if mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            tr = multihost_utils.process_allgather(tr, tiled=True)
        part = {k: np.asarray(v)[:hi - lo] for k, v in tr.items()}
        if checkpointer is not None:
            checkpointer.save_chunk(ci, part)
        parts.append(part)
    return {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}


def _make_checkpointer(checkpoint_dir, fingerprint_src):
    """SweepCheckpointer (or None) for a chunked memory sweep.

    ``fingerprint_src``: everything that must MATCH for loaded chunks to
    align with this run (axes, model params, chunking); a mismatched
    resume raises instead of silently mixing misaligned chunks.
    Multi-process runs are rejected for the same reason as
    analysis.phase_diagram.sweep_phase_grid: ranks would race the same
    chunk/manifest files."""
    if checkpoint_dir is None:
        return None
    import hashlib

    import jax

    from ..utils.checkpoint import SweepCheckpointer

    if jax.process_count() > 1:
        raise ValueError(
            "checkpoint_dir is not supported in a multi-process run: "
            "every process would race the same chunk/manifest files.  Run "
            "without checkpointing, or checkpoint per-slice single-process "
            "sweeps.")
    fp = hashlib.sha256(repr(fingerprint_src).encode()).hexdigest()
    return SweepCheckpointer(checkpoint_dir, fingerprint=fp)


def _x_plus_state(L: int, chi: int, dtype):
    """|+x>^L product MPS (not in the reference's state catalogue --
    tensor_utils.py:28-62 has only z-basis products -- so built here)."""
    import jax.numpy as jnp

    from ..core.mps import MPS
    from ..ops.cpx import C

    # python float (weak-typed), not np.float64: a strong-typed f64 scalar
    # scattered into the f32 tensor trips JAX's dtype-promotion
    # FutureWarning (and a future error) in jax._src.ops.scatter
    amp = float(1.0 / np.sqrt(2.0))
    B_re = jnp.zeros((L, chi, 2, chi), dtype=dtype)
    B_re = B_re.at[:, 0, 0, 0].set(amp).at[:, 0, 1, 0].set(amp)
    lam = jnp.zeros((L + 1, chi), dtype=dtype).at[:, 0].set(1.0)
    return MPS(B=C(B_re, jnp.zeros_like(B_re)), lam=lam)


def scan_memory_lifetime(gammas, L: int = 16, h_over_J: float = 0.3,
                         eps: float = 0.04, J: float = 1.0, tau: float = 1.0,
                         n_periods: int = 100, n_trajectories: int = 32,
                         n_realizations: int = 1, chi: int = 48,
                         disorder_seed: int = 42,
                         traj_seed: int = 0, coherence_leg: bool = True,
                         mesh=None, axis_name: str = "batch",
                         chunk_size: int | None = None,
                         checkpoint_dir: str | None = None) -> Dict:
    """Memory-lifetime sweep over dephasing rates, chunked device programs.

    Evolves ``len(gammas) * n_realizations * n_trajectories``
    stochastic-dephasing trajectories of the kicked-Ising DTC
    (theta = pi(1 - eps); disorder draws use the reference MT19937
    convention at seeds ``disorder_seed + r``) as one flattened vmapped
    batch -- gamma is a traced scan constant and the disorder fields are
    a per-row gate input, so the whole (gamma x realization x trajectory)
    grid shares one compiled program shape; pass ``mesh`` to shard the
    flattened batch over devices (same contract as
    open_system.evolve_ensemble).  Envelope statistics pool disorder and
    channel noise (mean/std over the combined realization x trajectory
    sample axis).

    The batch evolves in chunks of ``chunk_size`` rows per device program
    (padded to one shared compiled shape): a single 192-trajectory
    program at L=16 chi=48 kernel-faults the axon TPU worker (measured;
    same failure class as analysis.phase_diagram.sweep_drive_grid).
    Default None = chi-aware auto (_auto_chunk: the fault boundary
    scales ~ rows * chi^2, so chi=96 needs ~4x smaller chunks than
    chi=48, measured).  Pass ``chunk_size=0`` to force one program.

    ``checkpoint_dir``: per-chunk persistence (kill-and-resume for long
    production sweeps; each leg checkpoints under its own subdirectory).
    A resume with different parameters raises instead of mixing
    misaligned chunks; rejected in multi-process runs.

    Returns a dict with:
      gammas [G]; times [n]
      envelope [G, n]        sample-mean sign-corrected bit envelope
      envelope_std [G, n]    sample std (disorder + channel noise band)
      tau_bit [G]            fitted classical-bit lifetime (inf = no decay)
      sx_coherence [G, n]    (coherence_leg) mean <sx> of undriven |+x>
      t2_qubit [G]           (coherence_leg) fitted bare-qubit T2
      t2_analytic [G]        1 / (2 gamma)
    """
    import jax
    import jax.numpy as jnp

    from ..core.mps import create_initial_state
    from ..core.observables import staggered_signs
    from ..core.truncate import TruncParams
    from ..dynamics.open_system import _evolve_stochastic_scan
    from ..models.kicked_ising import (KickedIsingModel,
                                       draw_disorder_reference,
                                       make_floquet_gates)

    gammas = np.asarray(gammas, float)
    G = int(gammas.size)
    R = int(n_realizations)
    T = int(n_trajectories)
    dt = 2.0 * tau                       # one Floquet period
    dtype = jnp.float32
    tp = TruncParams(chi_max=0, svd_min=1e-7)
    theta = (1.0 - eps) * float(np.pi)

    h_all = np.stack([draw_disorder_reference(L, h_over_J * J,
                                              disorder_seed + r)
                      for r in range(R)])                 # [R, L]
    h_rows = jnp.asarray(np.tile(np.repeat(h_all, T, axis=0), (G, 1)), dtype)
    psi0 = create_initial_state(L, "neel", chi=chi, dtype=dtype)

    if chunk_size is None:
        chunk_size = _auto_chunk(chi, n_bonds=L - 1)

    def one(key, gdt, psi, gates):
        return _evolve_stochastic_scan(psi, gates, key, gdt, int(n_periods),
                                       tp)[2]

    def one_disordered(key, gdt, h_row):
        # gates are built INSIDE the vmapped row so the disorder
        # realization is one more batch axis (make_floquet_gates is pure
        # jnp, models/kicked_ising.py:72-97)
        gates = make_floquet_gates(J, h_row, tau, theta=theta, dtype=dtype)
        return one(key, gdt, psi0, gates)

    fp_src = ("memory_gamma", np.round(gammas, 12).tolist(), L,
              round(h_over_J, 12), round(eps, 12), round(J, 12),
              round(tau, 12), int(n_periods), R, T, chi, disorder_seed,
              traj_seed, int(chunk_size))
    keys = jax.random.split(jax.random.PRNGKey(traj_seed), G * R * T)
    gdt_flat = jnp.asarray(np.repeat(gammas * dt, R * T), dtype)
    ck = _make_checkpointer(
        os.path.join(checkpoint_dir, "bit") if checkpoint_dir else None,
        fp_src + ("bit",))
    tr = _chunked_vmap(one_disordered, (keys, gdt_flat, h_rows), chunk_size,
                       mesh, axis_name, checkpointer=ck)
    sz = tr["sz_sites"].reshape(G, R * T, n_periods, L)
    signs = np.asarray(staggered_signs(L))
    stag = (sz * signs).sum(axis=-1) / L                  # [G, R*T, n]
    # sign-correct per sample, mean over the disorder x trajectory pool,
    # then normalize by the MEAN's first-period magnitude (per-sample
    # normalization would amplify noisy small-denominator samples at
    # large gamma)
    env_traj = memory_envelope(stag, normalize=False)     # [G, R*T, n]
    env_mean = env_traj.mean(axis=1)                      # [G, n]
    ref = np.abs(env_mean[:, :1])
    ref = np.where(ref > 1e-12, ref, 1.0)
    envelope = env_mean / ref
    envelope_std = env_traj.std(axis=1) / ref
    times = (np.arange(n_periods) + 1) * dt
    tau_bit = np.array([fit_memory_lifetime(times, envelope[g])
                        for g in range(G)])

    out = {"gammas": gammas, "times": times, "envelope": envelope,
           "envelope_std": envelope_std, "tau_bit": tau_bit,
           "eps": float(eps), "h_over_J": float(h_over_J), "L": int(L),
           "n_realizations": R}

    if coherence_leg:
        # bare-qubit anchor: same channel, NO drive (identity gates via
        # J = h = 0, theta = 0), |+x> start, <sx> decay = e^{-2 gamma t}.
        # Disorder-free, so realizations add nothing -- pool R*T
        # trajectories instead for the same per-gamma sample count as
        # the bit leg.
        Tc = R * T
        idle = KickedIsingModel(L, J=0.0, h_disorder=0.0, tau=tau,
                                disorder_seed=disorder_seed, chi=chi,
                                theta=0.0)
        psix = _x_plus_state(L, chi, dtype)
        keys2 = jax.random.split(jax.random.PRNGKey(traj_seed + 1), G * Tc)
        gdt2 = jnp.asarray(np.repeat(gammas * dt, Tc), dtype)
        ck2 = _make_checkpointer(
            os.path.join(checkpoint_dir, "coherence") if checkpoint_dir
            else None, fp_src + ("coherence",))
        tr2 = _chunked_vmap(lambda k, g: one(k, g, psix, idle.gates),
                            (keys2, gdt2), chunk_size, mesh, axis_name,
                            checkpointer=ck2)
        sx = tr2["sx_sites"].reshape(G, Tc, n_periods, L)
        sx_mean = sx.mean(axis=(1, 3))                    # [G, n]
        out["sx_coherence"] = sx_mean
        out["t2_qubit"] = np.array([fit_memory_lifetime(times, sx_mean[g])
                                    for g in range(G)])
        with np.errstate(divide="ignore"):
            out["t2_analytic"] = np.where(gammas > 0, 1.0 / (2.0 * gammas),
                                          np.inf)
    return out


def scan_memory_vs_eps(eps_values, gamma: float, L: int = 16,
                       h_over_J: float = 0.3, J: float = 1.0,
                       tau: float = 1.0, n_periods: int = 100,
                       n_trajectories: int = 32, n_realizations: int = 1,
                       chi: int = 48,
                       disorder_seed: int = 42, traj_seed: int = 0,
                       mesh=None, axis_name: str = "batch",
                       chunk_size: int | None = None,
                       checkpoint_dir: str | None = None) -> Dict:
    """Stored-bit lifetime vs pulse imperfection at fixed dephasing rate.

    The pulse error eps = 1 - theta/pi is the knob that opens the
    dephasing channel's path into the stored bit (at eps = 0 the
    protection is exact -- see scan_memory_lifetime docstring), so
    tau_bit(eps) at fixed gamma is the memory budget a device designer
    actually reads: how much pulse miscalibration the DTC phase absorbs
    before the stored bit decays on the bare-qubit timescale.

    The kick angle is one more vmapped axis: gates are built INSIDE the
    vmapped row (make_floquet_gates is traceable in theta,
    models/kicked_ising.py:72-97), so the whole
    (eps x realization x trajectory) grid shares one compiled program
    shape per chunk; envelope statistics pool disorder and channel noise.

    chi convergence (measured on the TPU, L=16, h/J=0.3, gamma=0.02,
    100 periods, 16 trajectories): tau_bit is converged at the default
    chi=48 for eps <= 0.06 (chi 48 -> 96 moves it 0.02%); at eps = 0.12
    the same doubling moves tau_bit by -6% (truncation suppresses the
    entanglement-mediated decay channel, slightly flattering the
    lifetime) -- raise ``chi`` for quantitative work at large pulse
    error.

    Returns {"eps", "times", "envelope" [E, n], "envelope_std", "tau_bit"
    [E], "gamma"}.
    """
    import jax
    import jax.numpy as jnp

    from ..core.mps import create_initial_state
    from ..core.observables import staggered_signs
    from ..core.truncate import TruncParams
    from ..dynamics.open_system import _evolve_stochastic_scan
    from ..models.kicked_ising import (draw_disorder_reference,
                                       make_floquet_gates)

    eps_values = np.asarray(eps_values, float)
    E = int(eps_values.size)
    R = int(n_realizations)
    T = int(n_trajectories)
    dt = 2.0 * tau
    dtype = jnp.float32
    tp = TruncParams(chi_max=0, svd_min=1e-7)

    if chunk_size is None:
        chunk_size = _auto_chunk(chi, n_bonds=L - 1)
    h_all = np.stack([draw_disorder_reference(L, h_over_J * J,
                                              disorder_seed + r)
                      for r in range(R)])                 # [R, L]
    h_rows = jnp.asarray(np.tile(np.repeat(h_all, T, axis=0), (E, 1)), dtype)
    psi0 = create_initial_state(L, "neel", chi=chi, dtype=dtype)
    gdt = jnp.asarray(gamma * dt, dtype)

    def one(key, theta, h_row):
        gates = make_floquet_gates(J, h_row, tau, theta=theta,
                                   dtype=dtype)
        return _evolve_stochastic_scan(psi0, gates, key, gdt,
                                       int(n_periods), tp)[2]

    keys = jax.random.split(jax.random.PRNGKey(traj_seed), E * R * T)
    thetas = jnp.asarray(np.repeat(np.pi * (1.0 - eps_values), R * T), dtype)
    ck = _make_checkpointer(checkpoint_dir, (
        "memory_eps", np.round(eps_values, 12).tolist(), round(gamma, 12),
        L, round(h_over_J, 12), round(J, 12), round(tau, 12),
        int(n_periods), R, T, chi, disorder_seed, traj_seed,
        int(chunk_size)))
    tr = _chunked_vmap(one, (keys, thetas, h_rows), chunk_size, mesh,
                       axis_name, checkpointer=ck)
    sz = tr["sz_sites"].reshape(E, R * T, n_periods, L)
    signs = np.asarray(staggered_signs(L))
    stag = (sz * signs).sum(axis=-1) / L
    env_traj = memory_envelope(stag, normalize=False)
    env_mean = env_traj.mean(axis=1)
    ref = np.abs(env_mean[:, :1])
    ref = np.where(ref > 1e-12, ref, 1.0)
    envelope = env_mean / ref
    times = (np.arange(n_periods) + 1) * dt
    tau_bit = np.array([fit_memory_lifetime(times, envelope[e])
                        for e in range(E)])
    return {"eps": eps_values, "times": times, "envelope": envelope,
            "envelope_std": env_traj.std(axis=1) / ref, "tau_bit": tau_bit,
            "gamma": float(gamma), "h_over_J": float(h_over_J), "L": int(L),
            "n_realizations": R}


def generate_memory_figure(params: Dict, out_dir: str = "figures",
                           gammas=None, mesh=None, **scan_kwargs) -> tuple:
    """Render the memory-lifetime figure: envelope decay, tau vs gamma,
    tau vs pulse error.

    New deliverable (no reference filename to preserve):
    figures/memory_lifetime.{png,pdf}.  Left panel: stored-bit envelope
    vs time per gamma; middle panel: tau_bit(gamma) against the
    bare-qubit T2 = 1/(2 gamma) line -- the protection window is the gap
    between the two curves; right panel (``eps_values``, on by default):
    tau_bit(eps) at fixed ``eps_gamma`` -- the pulse-miscalibration
    budget.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if gammas is None:
        gammas = np.logspace(-3, -1.3, 6)
    eps_values = scan_kwargs.pop("eps_values",
                                 [0.0, 0.02, 0.04, 0.06, 0.09, 0.12])
    eps_gamma = scan_kwargs.pop("eps_gamma", 0.02)
    scan_kwargs.setdefault("J", float(params.get("J", 1.0)))
    scan_kwargs.setdefault("tau", float(params.get("T_DRIVE", 2.0)) /
                           (2.0 * scan_kwargs["J"]))
    scan_kwargs.setdefault("disorder_seed", int(params.get("RANDOM_SEED", 42)))
    # disorder-averaged defaults: 3 realizations x 12 trajectories pools
    # 36 samples per point at the same device cost as 36 trajectories
    scan_kwargs.setdefault("n_realizations", 3)
    scan_kwargs.setdefault("n_trajectories", 12)
    res = scan_memory_lifetime(gammas, mesh=mesh, **scan_kwargs)
    res_eps = None
    if eps_values is not None:
        eps_kwargs = {k: v for k, v in scan_kwargs.items()
                      if k not in ("eps", "coherence_leg", "traj_seed")}
        res_eps = scan_memory_vs_eps(eps_values, eps_gamma, mesh=mesh,
                                     **eps_kwargs)

    n_panels = 3 if res_eps is not None else 2
    fig, axes = plt.subplots(1, n_panels, figsize=(7 * n_panels, 6))
    ax1, ax2 = axes[0], axes[1]
    cmap = plt.get_cmap("viridis")
    for g, gamma in enumerate(res["gammas"]):
        c = cmap(g / max(len(res["gammas"]) - 1, 1))
        ax1.plot(res["times"], res["envelope"][g], color=c,
                 label=rf"$\gamma/J = {gamma:.3g}$")
        ax1.fill_between(res["times"],
                         res["envelope"][g] - res["envelope_std"][g],
                         res["envelope"][g] + res["envelope_std"][g],
                         color=c, alpha=0.15, linewidth=0)
    ax1.set_xlabel(r"Time $tJ$", fontsize=16)
    ax1.set_ylabel("Stored-bit envelope "
                   r"$(-1)^p \bar{M}_s(pT) / \bar{M}_s(T)$", fontsize=16)
    ax1.set_ylim(-0.05, 1.1)
    ax1.legend(fontsize=11)
    ax1.set_title(rf"DTC memory decay  ($L={res['L']}$, "
                  rf"$h/J={res['h_over_J']}$, $\epsilon={res['eps']}$, "
                  rf"{res['n_realizations']} disorder real.)",
                  fontsize=15)

    finite = np.isfinite(res["tau_bit"]) & \
        (res["tau_bit"] < 100.0 * res["times"][-1])   # see eps-panel note
    ax2.loglog(res["gammas"][finite], res["tau_bit"][finite], "o-",
               color="#1f77b4", label=r"DTC bit lifetime $\tau_{bit}$")
    if np.any(~finite):
        top = np.nanmax(res["tau_bit"][finite]) if np.any(finite) \
            else res["times"][-1]
        ax2.scatter(res["gammas"][~finite], np.full((~finite).sum(), top * 2),
                    marker="^", color="#1f77b4",
                    label=r"no decay within run ($\tau \to \infty$)")
    if "t2_analytic" in res:
        ax2.loglog(res["gammas"], res["t2_analytic"], "k--",
                   label=r"bare qubit $T_2 = 1/2\gamma$")
        ok = np.isfinite(res["t2_qubit"])
        ax2.loglog(res["gammas"][ok], res["t2_qubit"][ok], "s",
                   color="0.4", label=r"bare qubit $T_2$ (measured)")
    ax2.set_xlabel(r"Dephasing rate $\gamma / J$", fontsize=16)
    ax2.set_ylabel(r"Lifetime $\tau J$", fontsize=16)
    ax2.legend(fontsize=12)
    ax2.set_title("Memory lifetime vs dephasing", fontsize=15)

    if res_eps is not None:
        ax3 = axes[2]
        tb = res_eps["tau_bit"]
        # a fit to an f32-roundoff-flat envelope returns a huge FINITE tau
        # (e.g. 1e11 at eps=0); beyond ~100x the simulated window that is
        # "no decay within run", and plotting it literally would compress
        # every resolved point into one decade
        finite3 = np.isfinite(tb) & (tb < 100.0 * res_eps["times"][-1])
        ax3.semilogy(res_eps["eps"][finite3], tb[finite3], "o-",
                     color="#1f77b4", label=r"$\tau_{bit}(\epsilon)$")
        if np.any(~finite3):
            top3 = np.nanmax(tb[finite3]) if np.any(finite3) \
                else res_eps["times"][-1]
            ax3.scatter(res_eps["eps"][~finite3],
                        np.full((~finite3).sum(), top3 * 2), marker="^",
                        color="#1f77b4",
                        label=r"no decay within run ($\tau \to \infty$)")
        ax3.axhline(1.0 / (2.0 * res_eps["gamma"]), color="k",
                    linestyle="--",
                    label=rf"bare qubit $T_2$ at $\gamma/J = "
                          rf"{res_eps['gamma']:g}$")
        ax3.set_xlabel(r"Pulse imperfection $\epsilon = 1 - \theta/\pi$",
                       fontsize=16)
        ax3.set_ylabel(r"Lifetime $\tau J$", fontsize=16)
        ax3.legend(fontsize=12)
        ax3.set_title(rf"Pulse-error budget  ($\gamma/J = "
                      rf"{res_eps['gamma']:g}$)", fontsize=15)
    plt.tight_layout(pad=1.5)

    os.makedirs(out_dir, exist_ok=True)
    for ext, kw in (("png", {"dpi": 300}), ("pdf", {})):
        fig.savefig(os.path.join(out_dir, f"memory_lifetime.{ext}"),
                    bbox_inches="tight", facecolor="white", **kw)
    print(f"Memory-lifetime figure saved to {out_dir}/memory_lifetime.png/.pdf")
    if res_eps is not None:
        res["eps_scan"] = res_eps
    return fig, res
