"""Generate the repository header image (assets/header.png).

Original artwork (not derived from the reference's assets/header.jpg):
a stylized period-doubled magnetization trace over a phase-diagram
gradient, rendered with matplotlib.  Re-run to regenerate:

    python assets/make_header.py
"""
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    fig = plt.figure(figsize=(12, 3.2), dpi=150)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_axis_off()
    ax.set_xlim(0, 100)
    ax.set_ylim(-1.6, 1.6)
    ax.set_facecolor("#0b1021")
    fig.patch.set_facecolor("#0b1021")

    # Phase-diagram style background: DTC lobe intensity over (x ~ T*J).
    x = np.linspace(0, 100, 400)
    yy, xx = np.meshgrid(np.linspace(-1.6, 1.6, 120), x, indexing="ij")
    lobe = np.exp(-((xx - 52) / 34.0) ** 2) * np.exp(-(yy / 1.5) ** 2)
    ax.imshow(lobe, extent=(0, 100, -1.6, 1.6), origin="lower",
              cmap="twilight_shifted", alpha=0.55, aspect="auto")

    # Period-doubled staggered magnetization: the omega/2 subharmonic.
    t = np.arange(0, 100, 0.5)
    envelope = 0.92 + 0.08 * np.cos(2 * np.pi * t / 47.0)
    sub = envelope * np.cos(np.pi * t / 2.0)
    rng = np.random.default_rng(42)
    noisy = sub + 0.05 * rng.standard_normal(t.shape)
    ax.plot(t, noisy, color="#6ee7ff", lw=1.0, alpha=0.5)
    ax.plot(t, sub, color="#ffffff", lw=2.2)

    # Stroboscopic markers every drive period: alternate up/down.
    tk = np.arange(0, 100, 2.0)
    ax.plot(tk, np.cos(np.pi * tk / 2.0) * 0.92, "o", ms=4,
            color="#ffd166", mec="none", alpha=0.9)

    ax.text(50, 1.12, "timecrystal_tpu", ha="center", va="center",
            fontsize=30, fontweight="bold", color="white",
            family="DejaVu Sans")
    ax.text(50, -1.22,
            "discrete time crystals  ·  matrix-product states  ·  "
            "JAX / XLA / Pallas on TPU",
            ha="center", va="center", fontsize=12.5, color="#c9d4f2")

    out = os.path.join(HERE, "header.png")
    fig.savefig(out, facecolor=fig.get_facecolor())
    print("wrote", out)


if __name__ == "__main__":
    main()
