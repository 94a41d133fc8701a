#!/usr/bin/env python3
"""Time-crystal figure generation CLI (TPU-native).

Drop-in equivalent of the reference's entry point (reference main.py:1-18,
1165-1351): generates the DTC phase diagram and Figures A-D with Fourier
spectra from a config.txt parameter file.

Usage:
    python main.py                    # phase diagram + figures A-D
    python main.py --phase-only       # only the phase diagram
    python main.py --figures-only     # only figures A-D
    python main.py --config PATH      # custom parameter file

Differences from the reference (all upgrades, SURVEY.md section 7): the
phase grid evolves as one batched device program instead of a serial
double loop; Figure D plots true per-site <sigma_z_i(t)> (use
--synthetic-multisite for the reference's noisy approximation).
"""

from __future__ import annotations

import argparse
import sys
import time


def parse_arguments():
    parser = argparse.ArgumentParser(
        description="Generate time crystal physics figures",
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog="""
Examples:
  python main.py                    # Generate both phase diagram and figures A-D
  python main.py --phase-only       # Generate only phase diagram
  python main.py --figures-only     # Generate only figures A-D
        """,
    )
    mode = parser.add_mutually_exclusive_group()
    mode.add_argument("--phase-only", action="store_true",
                      help="Generate only the phase diagram")
    mode.add_argument("--figures-only", action="store_true",
                      help="Generate only the individual figures A-D")
    mode.add_argument("--drive-diagram", action="store_true",
                      help="Generate the drive-strength (pulse imperfection "
                           "eps x disorder h/J) DTC melting diagram -- the "
                           "sweep the reference abstract advertises but "
                           "never implements")
    mode.add_argument("--range-diagram", action="store_true",
                      help="Generate the interaction-range diagram: "
                           "subharmonic response A2T vs power-law exponent "
                           "alpha (J/r^alpha couplings, TDVP-integrated) -- "
                           "the third sweep axis the reference abstract "
                           "advertises but never implements")
    mode.add_argument("--memory-diagram", action="store_true",
                      help="Generate the DTC-as-quantum-memory lifetime "
                           "figure: stored-bit envelope decay + tau_bit vs "
                           "dephasing gamma against the bare-qubit T2 -- "
                           "the coherence-lifetime modeling the reference "
                           "abstract promises but never implements")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to configuration file (default: auto-detect)")
    parser.add_argument("--synthetic-multisite", action="store_true",
                        help="Reproduce the reference's synthetic Figure-D "
                             "per-site traces instead of true expectations")
    parser.add_argument("--cpu", action="store_true",
                        help="Force the CPU backend (the TPU plugin ignores "
                             "JAX_PLATFORMS; use this when the device is "
                             "absent or its worker is wedged)")
    return parser.parse_args()


def _configure_matplotlib(phase_only: bool) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if phase_only:
        plt.rcParams.update({
            "font.size": 14, "axes.titlesize": 16, "axes.labelsize": 14,
            "xtick.labelsize": 12, "ytick.labelsize": 12,
            "legend.fontsize": 12, "figure.titlesize": 18,
        })
    else:
        plt.rcParams.update({
            "font.size": 9, "axes.titlesize": 10, "axes.labelsize": 9,
            "xtick.labelsize": 8, "ytick.labelsize": 8,
            "legend.fontsize": 7, "figure.titlesize": 11,
        })
    plt.rcParams.update({
        "font.family": "sans-serif",
        "font.sans-serif": ["Arial", "Helvetica", "DejaVu Sans", "sans-serif"],
        "mathtext.fontset": "dejavusans",
        "figure.dpi": 100, "savefig.dpi": 600,
        "axes.linewidth": 0.8,
        "xtick.major.width": 0.8, "ytick.major.width": 0.8,
        "xtick.minor.width": 0.5, "ytick.minor.width": 0.5,
        "lines.linewidth": 1.5, "patch.linewidth": 0.4,
        "axes.grid": False,
        "axes.spines.top": False, "axes.spines.right": False,
        "xtick.direction": "out", "ytick.direction": "out",
        "figure.facecolor": "white", "axes.facecolor": "white",
    })


def main() -> None:
    args = parse_arguments()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from timecrystal_tpu.utils.backend import ensure_responsive_backend
        if ensure_responsive_backend(warn=False):
            print("WARNING: accelerator backend failed to initialize within "
                  "the deadline (wedged/absent TPU worker); falling back to "
                  "the CPU backend. Pass --cpu to skip this probe.")

    print("=" * 60)
    print("TIME CRYSTAL PHYSICS - UNIFIED FIGURE GENERATION (TPU)")
    print("=" * 60)

    from timecrystal_tpu.utils.cache import enable_compilation_cache
    from timecrystal_tpu.utils.config import read_parameters

    enable_compilation_cache()
    params = read_parameters(args.config)
    if not params:
        print("Failed to read parameters file.")
        return
    print(f"Loaded {len(params)} parameters")

    solo = args.drive_diagram or args.memory_diagram or args.range_diagram
    generate_phase = not (args.figures_only or solo)
    generate_figures = not (args.phase_only or solo)
    mode = ("Phase diagram only" if args.phase_only else
            "Individual figures A-D only" if args.figures_only else
            "Drive-strength diagram only" if args.drive_diagram else
            "Memory-lifetime diagram only" if args.memory_diagram else
            "Interaction-range diagram only" if args.range_diagram else
            "Both phase diagram and individual figures A-D")
    print(f"Mode: {mode}")

    _configure_matplotlib(phase_only=not generate_figures)

    start = time.time()
    try:
        if args.drive_diagram:
            from timecrystal_tpu.analysis.phase_diagram import \
                generate_drive_diagram
            import matplotlib.pyplot as plt
            generate_drive_diagram(params)
            plt.close("all")

        if args.range_diagram:
            from timecrystal_tpu.analysis.phase_diagram import \
                generate_range_diagram
            import matplotlib.pyplot as plt
            generate_range_diagram(params)
            plt.close("all")

        if args.memory_diagram:
            import matplotlib.pyplot as plt

            from timecrystal_tpu.analysis.memory import generate_memory_figure
            generate_memory_figure(params)
            plt.close("all")

        if generate_phase:
            from timecrystal_tpu.analysis.phase_diagram import generate_phase_diagram
            import matplotlib.pyplot as plt
            generate_phase_diagram(params)
            plt.close("all")

        if generate_figures:
            from timecrystal_tpu.analysis.figures import generate_individual_figures
            generate_individual_figures(
                params, synthetic_parity_d=args.synthetic_multisite)

        print("\n" + "=" * 60)
        print("SUCCESS: Figure generation completed!")
        print("\nKey findings:")
        print("- Sub-harmonic peaks at omega/2 confirm discrete time crystal behavior")
        print("- Disorder broadens but preserves the DTC spectral signature")
        print("- Dephasing gradually suppresses the sub-harmonic response")
        print("- All results from TPU-native tensor network TEBD evolution")
    except Exception as exc:
        print(f"Error generating figures: {exc}")
        import traceback
        traceback.print_exc()
        print(f"\nTotal execution time: {time.time() - start:.1f} seconds")
        # a failed run must not exit 0 (CI/scripts gate on the status)
        sys.exit(1)

    print(f"\nTotal execution time: {time.time() - start:.1f} seconds")


if __name__ == "__main__":
    main()
