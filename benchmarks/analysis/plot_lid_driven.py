"""Lid-driven-cavity centerline profiles vs Ghia et al. (1982).

Script port of the reference's notebooks/plot_lid_driven.ipynb /
plotting_lid_driven.ipynb centerline-benchmark cells: reads either a run's
``centerline_u_vs_y.csv`` (written by benchmarks/lid_driven_cavity.py) or a
field snapshot, extracts u(y) at x = 0.5, and overlays the Ghia data for
the requested Reynolds number.

Usage:
    python benchmarks/analysis/plot_lid_driven.py outputs/lid_driven_Re100 [Re]
    python benchmarks/analysis/plot_lid_driven.py outputs/some_run/data_001000.h5 [Re]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np


def _centerline_from_source(source):
    """(y, u_centerline) from a run dir's CSV or a snapshot file."""
    if os.path.isdir(source):
        csv_path = os.path.join(source, "centerline_u_vs_y.csv")
        data = np.loadtxt(csv_path, delimiter=",", skiprows=1)
        return data[:, 0], data[:, 1]
    from benchmarks.analysis.common import frame_grid, load_frame

    fields, _ = load_frame(source)
    a = fields["a"]
    _, _, _, _ = frame_grid(a)
    Ny, Nx = a.shape
    y = np.linspace(0.0, 1.0, Ny)
    return y, a[:, Nx // 2]


def run(source, Re=100, out_path=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from benchmarks.common import DATA_DIR, load_xy_csv

    y, u = _centerline_from_source(source)
    ghia_path = os.path.join(DATA_DIR, f"plot_u_y_Ghia{int(Re)}.csv")
    yg, ug = load_xy_csv(ghia_path, has_header=True)
    rms = float(np.sqrt(np.mean((np.interp(yg, y, u) - ug) ** 2)))

    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot(u, y, "-", lw=1.5, label="this framework")
    ax.plot(ug, yg, "o", ms=5, mfc="none", label=f"Ghia 1982 (Re={int(Re)})")
    ax.set_xlabel("u at x = 0.5")
    ax.set_ylabel("y")
    ax.set_title(f"Lid-driven cavity centerline, RMS = {rms:.2e}")
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()

    base = source if os.path.isdir(source) else os.path.dirname(source)
    out_path = out_path or os.path.join(base, f"ghia_centerline_Re{int(Re)}.png")
    fig.savefig(out_path, dpi=130)
    print(f"[plot_lid_driven] wrote {out_path}  (RMS vs Ghia: {rms:.3e})")
    return rms


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        sys.exit("usage: plot_lid_driven.py RUN_DIR_OR_SNAPSHOT [Re]")
    run(args[0], Re=int(args[1]) if len(args) > 1 else 100)
