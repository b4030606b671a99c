"""Simulation output, snapshots, and first-class checkpoint/resume.

Capability parity with pyRMT/output.py:213-322 (console energy line, energy
CSV time series, per-step field snapshots with scalar attributes) — and one
deliberate upgrade: the reference writes restart-sufficient HDF5 but no
driver implements resume (SURVEY.md section 5); here the whole ``SimState``
pytree round-trips through ``save_checkpoint`` / ``load_checkpoint``.

HDF5 is used when h5py is importable, with an .npz fallback, so the module
works in minimal environments.
"""
from __future__ import annotations

import csv
import dataclasses
import os

import numpy as np

from pyrmt_tpu.diagnostics import (
    compute_kinetic_energy,
    compute_strain_energy,
    compute_viscous_dissipation,
    divergence_2d_interior,
)

try:  # optional dependency
    import h5py

    _HAVE_H5 = True
except Exception:  # pragma: no cover
    _HAVE_H5 = False


# ── Checkpoint / resume (SimState pytree) ────────────────────────────────────

_STATE_FIELDS = ("u", "v", "p", "X1", "X2", "t", "step")


def save_checkpoint(path, state):
    """Serialize a SimState to ``path`` (.npz). Atomic-ish: tmp + rename."""
    arrays = {k: np.asarray(getattr(state, k)) for k in _STATE_FIELDS}
    if getattr(state, "phis0", None) is not None:
        arrays["phis0"] = np.asarray(state.phis0)
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_checkpoint(path, dtype=None):
    """Load a SimState back from ``path``. Returns a SimState pytree."""
    import jax.numpy as jnp

    from pyrmt_tpu.sim import SimState

    with np.load(path) as data:
        kw = {}
        for k in _STATE_FIELDS + (("phis0",) if "phis0" in data else ()):
            arr = data[k]
            if dtype is not None and arr.dtype.kind == "f":
                arr = arr.astype(dtype)
            kw[k] = jnp.asarray(arr)
    return SimState(**kw)


# ── Field snapshots ──────────────────────────────────────────────────────────


def save_snapshot(path, fields, attrs=None):
    """Write named field arrays (+ scalar attrs) to HDF5 if available,
    else .npz (attrs stored as 0-d arrays prefixed 'attr_')."""
    fields = {k: np.asarray(v) for k, v in fields.items()}
    attrs = attrs or {}
    if _HAVE_H5 and path.endswith(".h5"):
        with h5py.File(path, "w") as f:
            for k, v in fields.items():
                f.create_dataset(k, data=v)
            for k, v in attrs.items():
                f.attrs[k] = v
    else:
        if path.endswith(".h5"):
            path = path[:-3] + ".npz"
        payload = dict(fields)
        payload.update({f"attr_{k}": np.asarray(v) for k, v in attrs.items()})
        np.savez(path, **payload)
    return path


def load_snapshot(path):
    """Load a snapshot written by save_snapshot. Returns (fields, attrs)."""
    if _HAVE_H5 and path.endswith(".h5"):
        fields, attrs = {}, {}
        with h5py.File(path, "r") as f:
            for k in f.keys():
                fields[k] = np.asarray(f[k])
            for k in f.attrs:
                attrs[k] = f.attrs[k]
        return fields, attrs
    with np.load(path) as data:
        fields = {k: data[k] for k in data.files if not k.startswith("attr_")}
        attrs = {k[5:]: data[k].item() for k in data.files if k.startswith("attr_")}
    return fields, attrs


# ── Per-step console/CSV/HDF5 output (parity with output_simulation_data) ────


def output_simulation_data(
    dx, dy, phi, solid_mask, X1, X2, a, b, p, vis_output_freq, directory_name,
    step, dt, sigma_sxx, sigma_sxy, sigma_syy, J, mu_s=0.0, mu_f=0.0,
    rho_s=1.0, rho_f=1.0, w_t=None, eta_s=0.0, kappa=0.0, time=0.0,
    integrated_dissipation=0.0, out_root="outputs",
):
    """Console line + energy_history.csv append + field snapshot every
    ``vis_output_freq`` steps (parity: pyRMT/output.py:213-322)."""
    if w_t is None:
        w_t = 2.0 * dx

    if step % vis_output_freq == 0 or step == 1:
        a_np, b_np = np.asarray(a), np.asarray(b)
        vmag = np.hypot(a_np, b_np)
        div_field, div_interior = divergence_2d_interior(a, b, dx, dy, pad=4)
        ke = float(compute_kinetic_energy(a, b, rho_f, rho_s, phi, w_t, dx, dy))
        se = float(compute_strain_energy(X1, X2, phi, mu_s, dx, dy, kappa=kappa))
        eps = float(
            compute_viscous_dissipation(a, b, mu_f, phi, w_t, dx, dy, eta_s)
        )
        total_energy = ke + se + integrated_dissipation
        J_np = np.asarray(J)
        sig_mag = np.sqrt(
            np.asarray(sigma_sxx) ** 2
            + np.asarray(sigma_syy) ** 2
            + 2 * np.asarray(sigma_sxy) ** 2
        )
        print(
            f"[Step {step:05d}] t={time:.3f}, dt={float(dt):.2e}, "
            f"max|v|={vmag.max():.3f}, KE={ke:.4e}, SE={se:.4e}, "
            f"eps={eps:.4e}, E_tot={total_energy:.4e}, "
            f"min(J)={J_np.min():.3f}, max|sigma|={sig_mag.max():.2f}, "
            f"max|div|={np.abs(np.asarray(div_interior)).max():.2e}"
        )

        output_dir = os.path.join(out_root, directory_name)
        os.makedirs(output_dir, exist_ok=True)

        energy_file = os.path.join(output_dir, "energy_history.csv")
        file_exists = os.path.isfile(energy_file)
        with open(energy_file, "a", newline="") as csvfile:
            fieldnames = [
                "step", "time", "dt", "kinetic_energy", "strain_energy",
                "dissipation_rate", "integrated_dissipation", "total_energy",
            ]
            writer = csv.DictWriter(csvfile, fieldnames=fieldnames)
            if not file_exists or step == 1:
                writer.writeheader()
            writer.writerow({
                "step": step, "time": time, "dt": float(dt),
                "kinetic_energy": ke, "strain_energy": se,
                "dissipation_rate": eps,
                "integrated_dissipation": integrated_dissipation,
                "total_energy": total_energy,
            })

        save_snapshot(
            os.path.join(output_dir, f"data_{step:06d}.h5"),
            {
                "phi": phi, "X1": X1, "X2": X2, "J": J, "a": a, "b": b, "p": p,
                "sigma_xx": sigma_sxx, "sigma_yy": sigma_syy,
                "sigma_xy": sigma_sxy, "div_vel": div_field,
            },
            attrs={
                "time": time, "kinetic_energy": ke, "strain_energy": se,
                "dissipation_rate": eps,
                "integrated_dissipation": integrated_dissipation,
                "total_energy": total_energy,
            },
        )

    return integrated_dissipation


@dataclasses.dataclass
class EnergyLogger:
    """Rolling energy/trajectory history collected on host between chunks."""

    rows: list = dataclasses.field(default_factory=list)

    def log(self, **kw):
        self.rows.append(kw)

    def to_csv(self, path, fieldnames=None):
        if not self.rows:
            return
        fieldnames = fieldnames or list(self.rows[0].keys())
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fieldnames)
            w.writeheader()
            for r in self.rows:
                w.writerow(r)

    def array(self, *keys):
        return np.array([[r[k] for k in keys] for r in self.rows])

    @classmethod
    def from_csv(cls, path):
        """Reload a history written by ``to_csv`` (driver --resume support);
        Python float repr round-trips exactly, so resumed summaries see the
        identical pre-interruption rows."""
        rows = []
        with open(path, newline="") as f:
            for r in csv.DictReader(f):
                rows.append({k: float(v) for k, v in r.items()})
        return cls(rows=rows)
