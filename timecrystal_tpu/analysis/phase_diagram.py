"""Phase-diagram engine: batched on-device sweep + host-side scoring + plot.

Reference: main.py:275-567 (``calculate_phase_point`` /
``generate_phase_diagram``) -- a *serial* 12x10 double loop, each point a
full Python-level evolution.  Here the entire grid evolves as ONE batched
device program (parallel/sweep.py), sharded over the chip mesh when one is
available; detection and rendering stay on host.

Reference hard-codings preserved (SURVEY.md section 5 config caveat):
L=16, 80 periods, chi cap 24, seed from params, h/J in [0, 0.8] x T.J in
[0.8, 4.0] on a 12x10 grid, neel start, tau = T_J/(2 J).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from ..core.truncate import TruncParams
from ..parallel.sweep import SweepSpec, evolve_batch, evolve_batch_sharded, \
    phase_grid_batch, _basis_indices, _resolve_svd_method
from .detection import score_grid

GRID_HARDCODED = dict(n_sites=16, n_periods=80, max_chi=24,
                      h_range=(0.0, 0.8), T_range=(0.8, 4.0),
                      n_points=(12, 10))


def calculate_phase_point(h_over_J: float, T_J: float, params: Dict) -> Dict:
    """Single-point evaluation (reference main.py:275-415 contract)."""
    res = sweep_phase_grid([h_over_J], [T_J], params)
    return res["records"][0]


def sweep_phase_grid(h_values, T_values, params: Dict, mesh=None,
                     chi_pad: int = 32, show_progress: bool = False,
                     checkpoint_dir: str | None = None,
                     chunk_size: int | None = None,
                     svd_method: str | None = None) -> Dict:
    """Evolve the whole (h/J x T.J) grid in one batched call and score it.

    ``checkpoint_dir`` switches to chunked evolution with per-chunk
    persistence (utils/checkpoint.SweepCheckpointer): an interrupted sweep
    resumes at the first incomplete chunk.

    ``svd_method`` overrides the automatic SVD-backend routing
    (_resolve_svd_method) for every chunk -- the worker-fault recovery
    path (sweep_phase_grid_faultsafe) retries a kernel-faulted sweep with
    the fault-immune 'jacobi' kernel.  The SVD backend is deliberately
    NOT part of the chunk fingerprint: every backend computes the same
    truncated SVD (differences sit at the dtype noise floor), so chunks
    completed before a mid-sweep backend switch are kept, not recomputed.

    ``mesh='auto'`` (the generate_phase_diagram default) shards the grid
    batch over all devices whenever more than one is attached
    (parallel/sweep.evolve_batch_sharded); pass None to force single-device
    or an explicit jax.sharding.Mesh to control placement.  In a
    multi-process run (parallel/multihost.py) 'auto' spans every host's
    devices -- jax.devices() is global -- and evolve_batch_sharded routes
    through the allgathering multihost path, so the grid scales over DCN;
    ``checkpoint_dir`` is rejected there (ranks would race the same
    chunk files).
    """
    hc = GRID_HARDCODED
    tp = TruncParams(chi_max=hc["max_chi"],
                     svd_min=float(params.get("SVD_MIN", 1e-12)),
                     trunc_cut=float(params.get("SVD_CUTOFF", 1e-7)))
    if svd_method:
        tp = tp._replace(svd_method=svd_method)
    spec = SweepSpec(L=hc["n_sites"], chi=chi_pad, n_periods=hc["n_periods"],
                     J=float(params.get("J", 1.0)), theta=float(np.pi), tp=tp)
    h_fields, taus, hs, Ts = phase_grid_batch(
        h_values, T_values, spec,
        disorder_seed=int(params.get("RANDOM_SEED", 42)))
    # resolve svd_method='auto' ONCE from the FULL grid size so chunked
    # (checkpoint_dir) and single-program runs pick the same kernel --
    # per-chunk resolution could route a small chunk to a different SVD
    # method than the whole grid, making chunk_size change the numerics
    spec = _resolve_svd_method(spec, int(h_fields.shape[0]))
    basis = _basis_indices(spec.L, "neel")
    if mesh == "auto":
        import jax

        from ..parallel.sweep import default_mesh
        mesh = default_mesh() if len(jax.devices()) > 1 else None

    def _evolve(hf, tf):
        if mesh is not None:
            out = evolve_batch_sharded(hf, tf, basis, spec, mesh)
        else:
            out = evolve_batch(hf, tf, basis, spec)
        return {k: np.asarray(v) for k, v in out.items()}

    if checkpoint_dir is not None:
        # chunked + resumable: completed chunks are loaded from disk, only
        # the remainder evolves (kill-and-resume covered by
        # tests/test_utils.py).  Chunks share one padded size so every chunk
        # reuses the same compiled program.
        import jax

        if jax.process_count() > 1:
            raise ValueError(
                "checkpoint_dir is not supported in a multi-process run: "
                "every process would race the same chunk/manifest files "
                "(a shared filesystem interleaves the .tmp writes).  Run "
                "the sweep without checkpointing, or checkpoint per-slice "
                "single-process sweeps.")
        import hashlib

        import jax.numpy as jnp

        from ..utils.checkpoint import SweepCheckpointer

        B = int(h_fields.shape[0])
        if chunk_size is not None and int(chunk_size) < 0:
            raise ValueError(f"chunk_size must be >= 0, got {chunk_size}")
        cs = int(chunk_size or max(1, -(-B // 8)))
        n_chunks = -(-B // cs)
        # everything that must MATCH for loaded chunks to align with this
        # grid: fields/taus define the points, cs defines the chunk->row
        # mapping, spec the evolution -- a stale/misaligned checkpoint
        # would otherwise silently paint wrong A2T at wrong grid points
        # svd_method neutralized: a fault-recovery backend switch must
        # keep already-completed chunks (docstring above)
        fp_spec = spec._replace(tp=spec.tp._replace(svd_method="*"))
        fp_src = repr((np.round(np.asarray(h_fields), 12).tolist(),
                       np.round(np.asarray(taus), 12).tolist(),
                       np.asarray(basis).tolist(), fp_spec, cs)).encode()
        ck = SweepCheckpointer(checkpoint_dir,
                               fingerprint=hashlib.sha256(fp_src).hexdigest())
        done = ck.completed_chunks()
        parts = {}
        for c in range(n_chunks):
            if c in done:
                parts[c] = ck.load_chunk(c)
                continue
            lo, hi = c * cs, min((c + 1) * cs, B)
            hf, tf = h_fields[lo:hi], taus[lo:hi]
            if hi - lo < cs:                      # pad ragged tail chunk
                pad = cs - (hi - lo)
                hf = jnp.concatenate([hf, jnp.tile(hf[:1], (pad, 1))])
                tf = jnp.concatenate([tf, jnp.tile(tf[:1], (pad,))])
            tr = {k: v[:hi - lo] for k, v in _evolve(hf, tf).items()}
            ck.save_chunk(c, tr)
            parts[c] = tr
        traces = {k: np.concatenate([parts[c][k] for c in range(n_chunks)])
                  for k in parts[0]}
    else:
        traces = _evolve(h_fields, taus)

    taus_np = np.asarray(taus)
    n_stored = traces["loschmidt_echo"].shape[1]
    times = np.arange(n_stored)[None, :] * (2.0 * taus_np)[:, None]
    records = score_grid(traces, times, hs, Ts, drive_periods=2.0 * taus_np,
                         show_progress=show_progress)
    return {"records": records, "hs": hs, "Ts": Ts, "traces": traces}


def sweep_drive_grid(eps_values, h_values, params: Dict, mesh=None,
                     chi_pad: int = 48, n_sites: int | None = None,
                     n_periods: int | None = None,
                     chunk_size: int | None = None) -> Dict:
    """Drive-strength phase diagram: pulse imperfection eps x disorder h/J.

    The canonical DTC "melting" diagram (Yao et al., PRL 118, 030401):
    kick angle theta = pi (1 - eps), fixed drive period T_DRIVE from
    params, order parameter = subharmonic amplitude A2T of the staggered
    magnetization.  The reference ABSTRACT advertises "sweeping the drive
    strength" (README.md:19) but its code has no theta axis anywhere --
    this is a capability upgrade riding the same batched sweep engine
    (theta is just one more vmapped axis, parallel/sweep.evolve_batch).

    Every (eps, h) point uses the reference's per-point disorder
    convention: ONE MT19937 base pattern from RANDOM_SEED scaled by h
    (main.py:318-324 + kicked_ising.py:55-59).

    The grid evolves in chunks of ``chunk_size`` points per device
    program (padded to one shared compiled shape): a single 120-point
    program at chi_pad=48 kernel-faults the axon TPU worker (measured;
    same failure class as the >120-point chi_pad=32 limit recorded in
    examples/phase_diagram_hires.py).  Default None = chi-aware auto
    (utils.backend.auto_chunk_rows: the fault boundary scales
    ~ rows * chi^2; = 40 at the default chi_pad=48).  Pass
    ``chunk_size=0`` to force one program (fine on CPU and on backends
    without the worker limit).

    Returns {"A2T": [n_eps, n_h] array, "eps", "hs", "traces", "records"}.
    """
    import jax
    import jax.numpy as jnp

    from ..core.observables import (extract_subharmonic_amplitude,
                                    subharmonic_weight_fraction)
    from ..parallel.sweep import evolve_batch_sharded

    hc = GRID_HARDCODED
    L = int(n_sites or hc["n_sites"])
    n_per = int(n_periods or hc["n_periods"])
    J = float(params.get("J", 1.0))
    T_drive = float(params.get("T_DRIVE", 2.0))
    tau = T_drive / (2.0 * J)
    tp = TruncParams(chi_max=hc["max_chi"],
                     svd_min=float(params.get("SVD_MIN", 1e-12)),
                     trunc_cut=float(params.get("SVD_CUTOFF", 1e-7)))
    spec = SweepSpec(L=L, chi=chi_pad, n_periods=n_per, J=J,
                     theta=float(np.pi), tp=tp)

    np.random.seed(int(params.get("RANDOM_SEED", 42)))
    base = np.random.uniform(-1.0, 1.0, L)        # same MT19937 stream
    eps_g, h_g = np.meshgrid(np.asarray(eps_values, float),
                             np.asarray(h_values, float), indexing="ij")
    eps_f, h_f = eps_g.ravel(), h_g.ravel()
    h_fields = jnp.asarray(h_f[:, None] * J * base[None, :])
    taus = jnp.full((len(eps_f),), tau)
    thetas = jnp.asarray(np.pi * (1.0 - eps_f))
    # full-grid svd_method resolution (same reasoning as sweep_phase_grid:
    # chunking must not change which SVD kernel runs); entangling=True --
    # the eps axis drives theta != pi, so the worker's data-dependent
    # gram_eigh fault class applies (see _resolve_svd_method)
    spec = _resolve_svd_method(spec, len(eps_f), entangling=True)
    basis = _basis_indices(L, "neel")

    if mesh == "auto":
        from ..parallel.sweep import default_mesh
        mesh = default_mesh() if len(jax.devices()) > 1 else None

    def _evolve(hf, tf, th):
        if mesh is not None:
            out = evolve_batch_sharded(hf, tf, basis, spec, mesh, thetas=th)
        else:
            out = evolve_batch(hf, tf, basis, spec, thetas=th)
        return {k: np.asarray(v) for k, v in out.items()}

    if chunk_size is None:
        from ..utils.backend import auto_chunk_rows
        chunk_size = auto_chunk_rows(chi_pad, n_bonds=L - 1)
    B = len(eps_f)
    if int(chunk_size) < 0:
        raise ValueError(f"chunk_size must be >= 0, got {chunk_size}")
    cs = int(chunk_size) if chunk_size else B
    if cs >= B:
        traces = _evolve(h_fields, taus, thetas)
    else:
        parts = []
        for lo in range(0, B, cs):
            hi = min(lo + cs, B)
            hf, tf, th = h_fields[lo:hi], taus[lo:hi], thetas[lo:hi]
            if hi - lo < cs:                      # pad ragged tail chunk so
                pad = cs - (hi - lo)              # every chunk reuses one
                hf = jnp.concatenate([hf, jnp.tile(hf[:1], (pad, 1))])
                tf = jnp.concatenate([tf, jnp.tile(tf[:1], (pad,))])
                th = jnp.concatenate([th, jnp.tile(th[:1], (pad,))])
            parts.append({k: v[:hi - lo]          # compiled program
                          for k, v in _evolve(hf, tf, th).items()})
        traces = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    times = np.arange(n_per + 1) * (2.0 * tau)
    stag = traces["staggered_magnetization"]
    records = []
    a2t = np.zeros(len(eps_f))
    w2t = np.zeros(len(eps_f))
    for g in range(len(eps_f)):
        s = stag[g]
        ok = bool(np.all(np.isfinite(s)))
        if ok:
            a2t[g] = extract_subharmonic_amplitude(times, s, 2.0 * tau)
            # non-saturating companion metric: subharmonic fraction of
            # TOTAL spectral weight (carries gradient where A2T plateaus
            # at 1.0 -- see the generate_drive_diagram eps_range note)
            w2t[g] = subharmonic_weight_fraction(times, s, 2.0 * tau)
        records.append({"eps": float(eps_f[g]), "h_over_J": float(h_f[g]),
                        "A2T": float(a2t[g]),
                        "subharmonic_weight": float(w2t[g]), "success": ok})
    return {"A2T": a2t.reshape(eps_g.shape),
            "subharmonic_weight": w2t.reshape(eps_g.shape),
            "eps": np.asarray(eps_values, float),
            "hs": np.asarray(h_values, float), "records": records,
            "traces": traces}


def generate_drive_diagram(params: Dict, mesh=None, out_dir: str = "figures",
                           n_eps: int = 12, n_h: int = 10,
                           eps_range=(0.0, 0.5), h_range=(0.0, 0.8)) -> Tuple:
    """Render the drive-strength (eps x h/J) DTC melting diagram.

    New deliverable (no reference filename to preserve):
    figures/drive_strength_diagram.{png,pdf}.

    ``eps_range`` reaches 0.5 because the subharmonic-DOMINANCE metric
    (extract_subharmonic_amplitude normalizes by the max spectral bin)
    plateaus at 1.0 for the whole region where the omega/2 bin still
    dominates -- at L=16/80 periods the melting transition sits near
    eps ~ 0.4 (measured: eps=0.3 keeps A2T=1.0 at any h even though the
    raw staggered amplitude has decayed to ~0.24-0.45; eps=0.45 melts to
    A2T~0.3), so a narrower range renders a uniform map.  The RIGHT panel
    plots the non-saturating companion metric (subharmonic fraction of
    total spectral weight, observables.subharmonic_weight_fraction),
    which carries gradient on both sides of the melting boundary.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..utils.backend import auto_chunk_rows

    eps_values = np.linspace(*eps_range, n_eps)
    h_values = np.linspace(*h_range, n_h)
    # sweep_drive_grid defaults: chi_pad=48, L=16 (GRID_HARDCODED)
    chunk_size = auto_chunk_rows(48, n_bonds=GRID_HARDCODED["n_sites"] - 1)
    n_programs = -(-(n_eps * n_h) // chunk_size)
    print(f"Computing {n_eps * n_h} drive-strength points "
          f"({n_programs} batched device program"
          f"{'s' if n_programs != 1 else ''}, {chunk_size} points each)...")
    res = sweep_drive_grid(eps_values, h_values, params, mesh=mesh,
                           chunk_size=chunk_size)
    A2T = res["A2T"]
    W2T = res["subharmonic_weight"]

    fig, axes = plt.subplots(1, 2, figsize=(19, 8))
    panels = (
        (axes[0], A2T, r"Subharmonic response $A_{2T}$"),
        (axes[1], W2T,
         r"Subharmonic weight fraction $|F(\omega/2)|^2 / \Sigma |F|^2$"),
    )
    for ax, Z, label in panels:
        im = ax.imshow(Z.T, extent=[*eps_range, *h_range], aspect="auto",
                       origin="lower", cmap="viridis",
                       interpolation="bilinear", vmin=0,
                       vmax=max(float(np.max(Z)), 1e-12))
        cbar = plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
        cbar.set_label(label, rotation=270, labelpad=25, fontsize=18)
        cbar.ax.tick_params(labelsize=16)
        if np.max(Z) > 0.3:
            ax.contour(eps_values, h_values, Z.T,
                       levels=[float(np.max(Z)) * 0.5], colors="white",
                       linewidths=2, linestyles="--")
        ax.set_xlabel(r"Pulse imperfection $\epsilon = 1 - \theta/\pi$",
                      fontsize=18)
        ax.set_ylabel(r"Disorder strength $h/J$", fontsize=18)
        ax.tick_params(axis="both", which="major", labelsize=16)
    plt.tight_layout(pad=1.5)

    os.makedirs(out_dir, exist_ok=True)
    for ext, kw in (("png", {"dpi": 600}), ("pdf", {})):
        fig.savefig(os.path.join(out_dir, f"drive_strength_diagram.{ext}"),
                    bbox_inches="tight", facecolor="white",
                    edgecolor="none", **kw)
    print(f"Drive-strength diagram saved to "
          f"{out_dir}/drive_strength_diagram.png/.pdf")
    print(f"A2T range: [{np.min(A2T):.3f}, {np.max(A2T):.3f}]")
    print(f"Subharmonic weight fraction range: "
          f"[{np.min(W2T):.3f}, {np.max(W2T):.3f}]")
    return fig, axes


def generate_range_diagram(params: Dict, out_dir: str = "figures",
                           alphas=None, eps_values=(0.0, 0.05),
                           L: int = 12, n_periods: int = 24,
                           n_realizations: int = 3, chi: int = 48,
                           substeps: int = 2) -> Tuple:
    """Render the interaction-range axis: A2T vs power-law exponent alpha.

    The THIRD sweep axis the reference abstract advertises ("sweeping the
    drive strength, interaction range, and disorder",
    /root/reference/README.md:19) and its code never implements --
    models/long_range.py supplies the physics (J/r^alpha FSM-MPO + TDVP
    Floquet integrator, trapped-ion DTC regime alpha ~ 0.5-3); this
    renders the committed deliverable
    figures/interaction_range_diagram.{png,pdf}.

    One curve per pulse imperfection eps = 1 - theta/pi: at an exact pi
    pulse (eps = 0) the period doubling is protected at ANY range (flat
    A2T ~ 1, the sanity anchor); at finite eps the subharmonic response
    depends on how the interactions pin the spins -- the alpha axis shows
    how much range the DTC order tolerates.  The nearest-neighbor limit
    (alpha = inf, the reference's only physics) is the rightmost point of
    each curve.  Disorder-averaged over ``n_realizations`` reference-
    convention draws; error band = realization std.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..models.long_range import scan_interaction_range

    if alphas is None:
        alphas = [0.8, 1.2, 1.6, 2.0, 2.5, 3.0, None]
    J = float(params.get("J", 1.0))
    tau = float(params.get("T_DRIVE", 2.0)) / (2.0 * J)
    h_over_J = float(params.get("H_MAX", 0.3))
    seed = int(params.get("RANDOM_SEED", 42))

    # x positions: finite alphas at value; the NN limit one slot right
    finite = [a for a in alphas if a is not None and np.isfinite(a)]
    x_nn = (max(finite) + (finite[-1] - finite[0]) / max(len(finite) - 1, 1)
            if finite else 1.0)

    results = {}
    for eps in eps_values:
        print(f"Interaction-range scan at eps = {eps:g} "
              f"({len(alphas)} alphas x {n_realizations} realizations, "
              f"L={L}, {n_periods} periods, TDVP chi={chi})...")
        results[eps] = scan_interaction_range(
            alphas, L=L, J=J, h_disorder=h_over_J * J, tau=tau,
            theta=(1.0 - eps) * float(np.pi), n_periods=n_periods,
            n_realizations=n_realizations, chi=chi, substeps=substeps,
            seed0=seed, progress=True)

    fig, ax = plt.subplots(figsize=(10, 7))
    colors = plt.get_cmap("viridis")(np.linspace(0.15, 0.8,
                                                 len(eps_values)))
    xs = [float(a) if a is not None and np.isfinite(a) else x_nn
          for a in alphas]
    for c, eps in zip(colors, eps_values):
        res = results[eps]
        ax.errorbar(xs, res["a2t"], yerr=res["a2t_std"], marker="o",
                    color=c, capsize=3,
                    label=rf"$\epsilon = {eps:g}$")
    ax.axvline(x_nn, color="0.6", linestyle=":", linewidth=1)
    labels = [f"{x:g}" for x in xs[:-1]] + \
        ([r"NN ($\infty$)"] if alphas[-1] is None
         or not np.isfinite(alphas[-1]) else [f"{xs[-1]:g}"])
    ax.set_xticks(xs)
    ax.set_xticklabels(labels)
    ax.set_xlabel(r"Interaction-range exponent $\alpha$  "
                  r"($J(r) = J/r^\alpha$)", fontsize=16)
    ax.set_ylabel(r"Subharmonic response $A_{2T}$", fontsize=16)
    ax.set_ylim(-0.05, 1.1)
    ax.legend(fontsize=13, title="Pulse imperfection")
    ax.set_title(rf"DTC order vs interaction range  ($L={L}$, "
                 rf"$h/J={h_over_J:g}$, {n_realizations} disorder real.)",
                 fontsize=15)
    plt.tight_layout(pad=1.5)

    os.makedirs(out_dir, exist_ok=True)
    for ext, kw in (("png", {"dpi": 600}), ("pdf", {})):
        fig.savefig(os.path.join(out_dir, f"interaction_range_diagram.{ext}"),
                    bbox_inches="tight", facecolor="white",
                    edgecolor="none", **kw)
    print(f"Interaction-range diagram saved to "
          f"{out_dir}/interaction_range_diagram.png/.pdf")
    for eps in eps_values:
        print(f"  eps={eps:g}: A2T "
              f"{np.round(results[eps]['a2t'], 3).tolist()}")
    return fig, results


def generate_phase_diagram(params: Dict, mesh="auto", out_dir: str = "figures",
                           show_progress: bool = True,
                           faultsafe: bool | None = None) -> Tuple:
    """Compute, render, and save the phase diagram
    (reference main.py:417-567; same output files).

    ``faultsafe`` (default None = auto): route the sweep through the
    worker-fault recovery supervisor (analysis/faultsafe.py) -- the grid
    evolves in a supervised child with per-chunk checkpointing, and a
    kernel-faulted chunk re-runs in a fresh process on the fault-immune
    Jacobi kernel instead of killing ``python main.py --phase-only``.
    Auto = on for single-process accelerator runs; off on the CPU backend
    (nothing to fault) and in multi-process runs (the supervisor child is
    single-process)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hc = GRID_HARDCODED
    nh, nT = hc["n_points"]
    h_values = np.linspace(*hc["h_range"], nh)
    T_values = np.linspace(*hc["T_range"], nT)

    print("=" * 60)
    print("GENERATING PHASE DIAGRAM")
    print("=" * 60)
    print(f"Computing {nh * nT} phase diagram points (one batched device "
          f"program; the reference loops serially here)...")
    print(f"h/J range: [{hc['h_range'][0]:.2f}, {hc['h_range'][1]:.2f}]  "
          f"T*J range: [{hc['T_range'][0]:.2f}, {hc['T_range'][1]:.2f}]")
    print(f"System size: {hc['n_sites']}, Evolution periods: {hc['n_periods']}")

    if faultsafe is None:
        import jax

        faultsafe = (jax.default_backend() != "cpu"
                     and jax.process_count() == 1)
    if faultsafe:
        from .faultsafe import sweep_phase_grid_faultsafe

        res = sweep_phase_grid_faultsafe(h_values, T_values, params,
                                         show_progress=show_progress)
        if res["recovery"]["fault_recovered"]:
            print("NOTE: a worker kernel fault was recovered mid-sweep "
                  f"(attempts: {res['recovery']['attempts']}, final SVD "
                  f"routing: {res['recovery']['svd_method']})")
    else:
        res = sweep_phase_grid(h_values, T_values, params, mesh=mesh,
                               show_progress=show_progress)
    A2T = np.zeros((nT, nh))
    raw = np.zeros((nT, nh))
    success = np.zeros((nT, nh), dtype=bool)
    for rec, h, T in zip(res["records"], res["hs"], res["Ts"]):
        i = int(np.argmin(np.abs(h_values - h)))
        j = int(np.argmin(np.abs(T_values - T)))
        A2T[j, i] = rec["A2T"]
        raw[j, i] = rec["dtc_score_raw"]
        success[j, i] = rec["success"]

    fig, ax = plt.subplots(figsize=(10, 8))
    im = ax.imshow(A2T, extent=[*hc["h_range"], *hc["T_range"]],
                   aspect="auto", origin="lower", cmap="viridis",
                   interpolation="bilinear", vmin=0,
                   vmax=max(np.max(A2T), 1e-12))
    cbar = plt.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
    cbar.set_label(r"DTC Order Parameter $A_{2T}$", rotation=270,
                   labelpad=25, fontsize=18)
    cbar.ax.tick_params(labelsize=16)

    if np.max(A2T) > 0.1:
        ax.contour(h_values, T_values, A2T,
                   levels=np.linspace(0.1, np.max(A2T), 4),
                   colors="white", linewidths=0.8, alpha=0.8)
    if np.max(A2T) > 0.3:
        ax.contour(h_values, T_values, A2T, levels=[np.max(A2T) * 0.5],
                   colors="white", linewidths=2, linestyles="--")

    label_style = dict(fontsize=16, color="white", ha="center", va="center",
                       weight="bold",
                       bbox=dict(boxstyle="round,pad=0.4", facecolor="black",
                                 alpha=0.7))
    ax.text(0.1, 3.5, "Thermal\n(Fast Drive)", **label_style)
    ax.text(0.25, 2.0, "DTC", **{**label_style, "fontsize": 18})
    ax.text(0.65, 2.5, "MBL\n(High Disorder)", **label_style)
    ax.text(0.4, 1.0, "Adiabatic\n(Slow Drive)", **label_style)
    ax.axvline(x=0.5, color="red", linestyle=":", alpha=0.6, linewidth=1)
    ax.text(0.52, 3.7, "MBL transition", fontsize=16, color="red",
            rotation=90, va="top")
    ax.set_xlabel(r"Disorder strength $h/J$", fontsize=18)
    ax.set_ylabel(r"Drive period $T \cdot J$", fontsize=18)
    ax.tick_params(axis="both", which="major", labelsize=16)
    plt.tight_layout(pad=1.5)

    os.makedirs(out_dir, exist_ok=True)
    for ext, kw in (("png", {"dpi": 600}), ("pdf", {})):
        fig.savefig(os.path.join(out_dir, f"final_phase_diagram.{ext}"),
                    bbox_inches="tight", facecolor="white",
                    edgecolor="none", **kw)

    print(f"\nPhase diagram saved to {out_dir}/final_phase_diagram.png/.pdf")
    print(f"Success rate: {np.mean(success) * 100:.1f}%")
    print(f"A2T range: [{np.min(A2T):.3f}, {np.max(A2T):.3f}]")
    print(f"Raw DTC score range: [{np.min(raw):.3f}, {np.max(raw):.3f}]")
    best = np.unravel_index(np.argmax(A2T), A2T.shape)
    print(f"Best DTC point: h/J = {h_values[best[1]]:.3f}, "
          f"T*J = {T_values[best[0]]:.3f}, A2T = {A2T[best]:.3f}")
    return fig, ax
