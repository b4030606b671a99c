"""Panel/overlay figures for the soft disc in the lid-driven cavity.

Capability parity with the reference's post-processing layer
(benchmarks/plot_soft_disc_panels.py): reads the ``snap_t*`` field snapshots
written by ``soft_disc_in_lid_driven.run(..., snapshot_times=[...])`` and
produces (1) a panel grid per resolution — velocity magnitude with the solid
masked, the phi=0 interface, and reference-map contours — and (2) an
interface-only overlay comparing two resolutions at each time.

Snapshots may be .h5 (h5py available) or .npz (fallback writer in
pyrmt_tpu.io).

Usage:
    python benchmarks/plot_soft_disc_panels.py [out_dir_64] [out_dir_128]
"""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyrmt_tpu.io import load_snapshot


def _grid(N):
    x = np.linspace(0, 1, N)
    return np.meshgrid(x, x)


def load_snaps(out_dir):
    snaps = []
    paths = sorted(
        glob.glob(os.path.join(out_dir, "snap_t*.h5"))
        + glob.glob(os.path.join(out_dir, "snap_t*.npz"))
    )
    for path in paths:
        fields, attrs = load_snapshot(path)
        fields["t"] = float(attrs.get("t", np.nan))
        fields["t_target"] = float(attrs.get("t_target", np.nan))
        snaps.append(fields)
    return snaps


def panel_grid(out_dir, title, save):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    snaps = load_snaps(out_dir)
    if not snaps:
        print(f"  no snapshots in {out_dir}")
        return None
    N = snaps[0]["phi"].shape[0]
    X, Y = _grid(N)
    n = len(snaps)
    ncol = min(4, n)
    nrow = int(np.ceil(n / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.0 * ncol, 3.0 * nrow))
    axes = np.atleast_1d(axes).ravel()
    for ax, s in zip(axes, snaps):
        phi, a, b = s["phi"], s["a"], s["b"]
        X1, X2 = s["X1"], s["X2"]
        umag = np.ma.masked_where(phi <= 0, np.hypot(a, b))
        ax.contourf(X, Y, umag, levels=40, cmap="Spectral_r")
        ax.contour(X, Y, phi, levels=[0.0], colors="k", linewidths=1.2)
        inside = phi <= 0
        for comp in (X1, X2):
            masked = np.ma.masked_where(~inside, comp)
            ax.contour(X, Y, masked, levels=10, colors="gray",
                       linewidths=0.4, alpha=0.7)
        ax.set_title(f"t = {s['t_target']:.2f}", fontsize=9)
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
    for ax in axes[n:]:
        ax.axis("off")
    fig.suptitle(title)
    fig.tight_layout()
    fig.savefig(save, dpi=140)
    print(f"  saved {save}")
    return snaps


def interface_overlay(dirs_labels, save):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    all_snaps = {lab: load_snaps(d) for d, lab in dirs_labels}
    all_snaps = {k: v for k, v in all_snaps.items() if v}
    if len(all_snaps) < 2:
        print("  need snapshots from two resolutions for the overlay")
        return
    n = min(len(v) for v in all_snaps.values())
    ncol = min(4, n)
    nrow = int(np.ceil(n / ncol))
    fig, axes = plt.subplots(nrow, ncol, figsize=(3.0 * ncol, 3.0 * nrow))
    axes = np.atleast_1d(axes).ravel()
    colors = ["tab:blue", "tab:red", "tab:green"]
    for k in range(n):
        ax = axes[k]
        for ci, (lab, snaps) in enumerate(all_snaps.items()):
            s = snaps[k]
            N = s["phi"].shape[0]
            X, Y = _grid(N)
            ax.contour(X, Y, s["phi"], levels=[0.0], colors=colors[ci],
                       linewidths=1.2)
        ax.set_title(f"t = {list(all_snaps.values())[0][k]['t_target']:.2f}",
                     fontsize=9)
        ax.set_aspect("equal")
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
    for ax in axes[n:]:
        ax.axis("off")
    handles = [plt.Line2D([0], [0], color=colors[i], label=lab)
               for i, lab in enumerate(all_snaps)]
    fig.legend(handles=handles, loc="lower right")
    fig.tight_layout()
    fig.savefig(save, dpi=140)
    print(f"  saved {save}")


if __name__ == "__main__":
    d64 = sys.argv[1] if len(sys.argv) > 1 else "outputs/soft_disc_lid_N64_semilagrangian"
    d128 = sys.argv[2] if len(sys.argv) > 2 else "outputs/soft_disc_lid_N128_semilagrangian"
    out = "outputs/panels"
    os.makedirs(out, exist_ok=True)
    for d, lab in ((d64, "N64"), (d128, "N128")):
        if os.path.isdir(d):
            panel_grid(d, f"soft disc in lid-driven cavity ({lab})",
                       os.path.join(out, f"panels_{lab}.png"))
    interface_overlay([(d64, "N=64"), (d128, "N=128")],
                      os.path.join(out, "interface_overlay.png"))
