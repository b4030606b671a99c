"""Energy / divergence diagnostics — in-graph, jit-safe.

Capability parity with pyRMT/output.py:6-211:
  * kinetic energy with the smoothed-Heaviside local density,
  * strain energy W = (mu/2)(I1-2) + (kappa/2)(J-1)^2, deliberately
    ln(J)-free so it is the potential of sigma = mu_s b (see the reference's
    own note, pyRMT/output.py:118-125), computed from edge-padded gradients,
  * viscous dissipation 2 mu_local D:D with mu_local = H mu_f + (1-H) eta_s,
  * interior divergence (pad cells excluded for statistics).

All functions return scalars (or fields) inside the jitted graph, so a
benchmark can log physics invariants without host round-trips.
"""
from __future__ import annotations

import jax.numpy as jnp

from pyrmt_tpu.ops.fd import grad_central_x_2nd, grad_central_y_2nd
from pyrmt_tpu.ops.stress import smoothed_heaviside


def compute_kinetic_energy(a, b, rho_f, rho_s, phi, w_t, dx, dy):
    """KE = integral 0.5 rho_local |u|^2 (parity: pyRMT/output.py:6-39).

    For multi-solid states pass phi as (S, Ny, Nx); the n-fluid mixture
    density is used."""
    if phi.ndim == 3:
        H = smoothed_heaviside(phi, w_t)
        S = phi.shape[0]
        Hf = jnp.sum(H, axis=0) - (S - 1.0)
        rho_local = Hf * rho_f + jnp.sum(1.0 - H, axis=0) * rho_s
    else:
        H = smoothed_heaviside(phi, w_t)
        rho_local = (1.0 - H) * rho_s + H * rho_f
    return jnp.sum(0.5 * rho_local * (a**2 + b**2)) * dx * dy


def _edge_pad4(f):
    pad = 4
    f = jnp.concatenate([jnp.repeat(f[0:1, :], pad, 0), f, jnp.repeat(f[-1:, :], pad, 0)], 0)
    f = jnp.concatenate([jnp.repeat(f[:, 0:1], pad, 1), f, jnp.repeat(f[:, -1:], pad, 1)], 1)
    return f


def compute_strain_energy(X1, X2, phi, mu_s, dx, dy, kappa=0.0):
    """SE over the solid (phi <= 0) from F = G^{-1} with edge-padded central
    gradients (parity: pyRMT/output.py:41-134)."""
    pad = 4
    X1p = _edge_pad4(X1)
    X2p = _edge_pad4(X2)
    G11 = grad_central_x_2nd(X1p, dx)[pad:-pad, pad:-pad]
    G12 = grad_central_y_2nd(X1p, dy)[pad:-pad, pad:-pad]
    G21 = grad_central_x_2nd(X2p, dx)[pad:-pad, pad:-pad]
    G22 = grad_central_y_2nd(X2p, dy)[pad:-pad, pad:-pad]

    detG = G11 * G22 - G12 * G21
    good = (jnp.abs(detG) > 1e-10) & (phi <= 0.0)
    safe = jnp.where(good, detG, 1.0)
    F11 = G22 / safe
    F12 = -G12 / safe
    F21 = -G21 / safe
    F22 = G11 / safe
    I1 = F11**2 + F21**2 + F12**2 + F22**2
    J = 1.0 / safe
    se_density = jnp.where(
        good, 0.5 * mu_s * (I1 - 2.0) + 0.5 * kappa * (J - 1.0) ** 2, 0.0
    )
    return jnp.sum(se_density) * dx * dy


def compute_viscous_dissipation(a, b, mu_f, phi, w_t, dx, dy, eta_s=0.0):
    """epsilon = integral 2 mu_local D:D (parity: pyRMT/output.py:136-193)."""
    du_dx = grad_central_x_2nd(a, dx)
    dv_dy = grad_central_y_2nd(b, dy)
    du_dy = grad_central_y_2nd(a, dy)
    dv_dx = grad_central_x_2nd(b, dx)
    D_xy = 0.5 * (du_dy + dv_dx)
    if phi.ndim == 3:
        H = smoothed_heaviside(phi, w_t)
        S = phi.shape[0]
        Hf = jnp.sum(H, axis=0) - (S - 1.0)
        mu_local = Hf * mu_f + jnp.sum(1.0 - H, axis=0) * eta_s
    else:
        H = smoothed_heaviside(phi, w_t)
        mu_local = H * mu_f + (1.0 - H) * eta_s
    density = 2.0 * mu_local * (du_dx**2 + dv_dy**2 + 2.0 * D_xy**2)
    return jnp.sum(density) * dx * dy


def divergence_2d_interior(u, v, dx, dy, pad=3):
    """Central divergence with a ``pad``-cell margin excluded — avoids the
    lid-corner singularities in the statistics
    (parity: pyRMT/output.py:195-211). Returns (full_field, interior)."""
    div_i = (u[pad:-pad, pad + 1 : -pad + 1 or None] - u[pad:-pad, pad - 1 : -pad - 1]) / (
        2.0 * dx
    ) + (v[pad + 1 : -pad + 1 or None, pad:-pad] - v[pad - 1 : -pad - 1, pad:-pad]) / (
        2.0 * dy
    )
    divU = jnp.pad(div_i, pad)
    return divU, div_i


def disc_centroid(phi, X, Y):
    """Area-weighted centroid of the solid region (phi <= 0), NaN-free inside
    jit (parity: benchmarks/common.py:105-110)."""
    mask = (phi <= 0.0).astype(X.dtype)
    area = jnp.sum(mask)
    safe = jnp.maximum(area, 1.0)
    cx = jnp.sum(X * mask) / safe
    cy = jnp.sum(Y * mask) / safe
    return jnp.where(area > 0, cx, jnp.nan), jnp.where(area > 0, cy, jnp.nan)


def extract_centerlines(a, b, X, Y):
    """(y, u(x=0.5)) and (x, v(y=0.5)) centerline profiles
    (parity: benchmarks/common.py:96-103)."""
    Ny, Nx = a.shape
    j_mid = Ny // 2
    i_mid = Nx // 2
    return Y[:, i_mid], a[:, i_mid], X[j_mid, :], b[j_mid, :]
