"""Shared loaders for the analysis/post-processing scripts.

Capability parity target: the reference's notebook layer
(/root/reference/notebooks/plot_*.ipynb) reads ``data_??????.h5`` frame
directories and ``energy_history.csv``; these helpers read the same layout
written by pyrmt_tpu.io (HDF5 with .npz fallback).
"""
from __future__ import annotations

import os
import re

import numpy as np

_FRAME_RE = re.compile(r"^data_(\d+)\.(h5|npz)$")


def list_frames(frames_dir):
    """Sorted (step, path) pairs for data_??????.h5/.npz files in a dir
    (parity: /root/reference/helper/lid_driven_gif.py:11-15)."""
    out = []
    for f in os.listdir(frames_dir):
        m = _FRAME_RE.match(f)
        if m:
            out.append((int(m.group(1)), os.path.join(frames_dir, f)))
    return sorted(out)


def load_frame(path):
    """(fields, attrs) for one snapshot (works for both repo outputs and
    reference-layout HDF5 — same dataset names)."""
    from pyrmt_tpu.io import load_snapshot

    return load_snapshot(path)


def frame_grid(phi):
    """Unit-square node-centred coordinates for a (Ny, Nx) field."""
    Ny, Nx = phi.shape
    x = np.linspace(0.0, 1.0, Nx)
    y = np.linspace(0.0, 1.0, Ny)
    X, Y = np.meshgrid(x, y)
    return X, Y, x[1] - x[0], y[1] - y[0]


def get_centroid(phi, X, Y):
    """Centroid of the solid region phi <= 0 (parity:
    notebooks/plot_centroid.ipynb get_centroid)."""
    mask = phi <= 0
    if not mask.any():
        return None
    return float(X[mask].mean()), float(Y[mask].mean())


def get_area(phi, dx, dy):
    """Cell-count area of phi <= 0 (parity: plot_centroid.ipynb get_area)."""
    return float(np.sum(phi <= 0) * dx * dy)


_ENERGY_ALIASES = {
    "t": "time", "ke": "kinetic_energy", "se": "strain_energy",
    "dissipation": "dissipation_rate",
}


def load_energy_csv(run_dir):
    """Dict of columns from a run's energy_history.csv. Column names are
    normalised to the reference layout (time/kinetic_energy/strain_energy/
    dissipation_rate/...); the drivers' EnergyLogger short names (t/ke/se/
    dissipation) are accepted as aliases."""
    import csv

    path = os.path.join(run_dir, "energy_history.csv")
    cols = {}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            for k, v in row.items():
                try:
                    cols.setdefault(_ENERGY_ALIASES.get(k, k), []).append(
                        float(v))
                except (TypeError, ValueError):
                    pass
    return {k: np.asarray(v) for k, v in cols.items()}


def ensure_outdir(path):
    os.makedirs(path, exist_ok=True)
    return path
