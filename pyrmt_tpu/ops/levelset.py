"""Level-set machinery: BCs, curvature, reinitialisation.

Capability parity with pyRMT/functions.py:33-46 (apply_phi_BCs),
:758-782 (compute_curvature), :1290-1373 (switchable reinitialisation).

Reinitialisation methods:
  * 'none' : identity (the analytic rebuild from the reference map already
             yields a signed-distance field) — the default everywhere.
  * 'pde'  : Sussman-Smereka-Osher upwind iteration with smoothed sign and
             Godunov upwinding, as a ``lax.fori_loop`` (fixed iteration count,
             fully on-device).
  * 'fmm'  : the reference uses scikit-fmm's sequential fast-marching method,
             which has no parallel equivalent on TPU. We honour the same
             behavioural contract (redistance a corrupted SDF to |grad phi|~1
             near the front, tolerances from tests/test_reinit.py) with a
             long-horizon PDE reinitialisation — O(iters) data-parallel sweeps
             instead of a serial heap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_phi_BCs(phi):
    """3-cell periodic wrap of phi (parity: pyRMT/functions.py:33-46)."""
    phi = phi.at[0:3, :].set(phi[-6:-3, :])
    phi = phi.at[-3:, :].set(phi[3:6, :])
    phi = phi.at[:, 0:3].set(phi[:, -6:-3])
    phi = phi.at[:, -3:].set(phi[:, 3:6])
    return phi


def compute_curvature(phi, dx, dy):
    """kappa = div(grad(phi)/|grad(phi)|) with 2nd-order central stencils
    (parity: pyRMT/functions.py:758-782)."""
    from pyrmt_tpu.ops.fd import grad_central_x_2nd, grad_central_y_2nd

    phi_x = grad_central_x_2nd(phi, dx)
    phi_y = grad_central_y_2nd(phi, dy)
    grad_mag = jnp.sqrt(phi_x**2 + phi_y**2) + 1e-12
    nx = phi_x / grad_mag
    ny = phi_y / grad_mag
    return grad_central_x_2nd(nx, dx) + grad_central_y_2nd(ny, dy)


def _edge_pad(phi):
    phi = jnp.concatenate([phi[0:1, :], phi, phi[-1:, :]], axis=0)
    return jnp.concatenate([phi[:, 0:1], phi, phi[:, -1:]], axis=1)


def reinitialize_phi_PDE(
    phi_in, dx, dy, num_iters, apply_phi_BCs_func=None, dt_reinit_factor=0.5
):
    """Sussman-Smereka-Osher reinitialisation (pyRMT/functions.py:1290-1332),
    as a fixed-count ``lax.fori_loop``. ``num_iters`` is static."""
    sign0 = phi_in / jnp.sqrt(phi_in**2 + dx**2)
    dt_reinit = dt_reinit_factor * min(dx, dy)
    mask_pos = sign0 > 0
    mask_neg = sign0 < 0

    def body(_, phi):
        pp = _edge_pad(phi)
        Dx_m = (pp[1:-1, 1:-1] - pp[1:-1, 0:-2]) / dx
        Dx_p = (pp[1:-1, 2:] - pp[1:-1, 1:-1]) / dx
        Dy_m = (pp[1:-1, 1:-1] - pp[0:-2, 1:-1]) / dy
        Dy_p = (pp[2:, 1:-1] - pp[1:-1, 1:-1]) / dy

        gx_pos = jnp.maximum(jnp.maximum(Dx_m, 0.0) ** 2, jnp.minimum(Dx_p, 0.0) ** 2)
        gy_pos = jnp.maximum(jnp.maximum(Dy_m, 0.0) ** 2, jnp.minimum(Dy_p, 0.0) ** 2)
        gx_neg = jnp.maximum(jnp.minimum(Dx_m, 0.0) ** 2, jnp.maximum(Dx_p, 0.0) ** 2)
        gy_neg = jnp.maximum(jnp.minimum(Dy_m, 0.0) ** 2, jnp.maximum(Dy_p, 0.0) ** 2)

        gx = jnp.where(mask_pos, gx_pos, jnp.where(mask_neg, gx_neg, 0.0))
        gy = jnp.where(mask_pos, gy_pos, jnp.where(mask_neg, gy_neg, 0.0))
        grad_mag = jnp.sqrt(gx + gy)

        phi = phi - dt_reinit * sign0 * (grad_mag - 1.0)
        if apply_phi_BCs_func is not None:
            phi = apply_phi_BCs_func(phi)
        return phi

    return jax.lax.fori_loop(0, num_iters, body, phi_in)


def reinitialize_phi_fmm_equivalent(phi, dx, dy):
    """TPU substitute for scikit-fmm: long-horizon SSO PDE reinitialisation.

    The FMM propagates exact distances outward in one serial heap pass; on
    TPU we instead run the data-parallel upwind PDE to convergence near the
    front (the region every consumer of 'fmm' in the reference cares about —
    see tests/test_reinit.py:27-50 tolerances). Iteration count scales with
    the grid so information crosses the band at unit speed.
    """
    n = max(phi.shape)
    iters = max(200, int(1.5 * n))
    return reinitialize_phi_PDE(phi, dx, dy, iters, None, dt_reinit_factor=0.5)


def reinitialize_level_set(
    phi, dx, dy, method="none", num_iters=20, dt_reinit_factor=0.2,
    apply_phi_BCs_func=None,
):
    """Switchable reinitialisation (parity: pyRMT/functions.py:1353-1373)."""
    if method == "none":
        return phi
    elif method == "pde":
        return reinitialize_phi_PDE(
            phi, dx, dy, num_iters, apply_phi_BCs_func, dt_reinit_factor
        )
    elif method == "fmm":
        return reinitialize_phi_fmm_equivalent(phi, dx, dy)
    else:
        raise ValueError(
            "Unknown reinit method %r (expected 'none', 'pde' or 'fmm')" % (method,)
        )


def rebuild_phi_from_reference_map(X1, X2, phi_init_func):
    """phi = phi_init(X1, X2) — compatibility reconstruction
    (parity: pyRMT/functions.py:1287-1288)."""
    return phi_init_func(X1, X2)
