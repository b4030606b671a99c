"""Pallas TPU kernel: fused one-fluid blended momentum RHS.

This is the reference's own #1 optimization lever — "njit-fuse
velocity_rhs_blended_optimized: compile the whole RHS so the ~15 NumPy
temporaries fuse into fewer passes" (upstream docs/PERFORMANCE.md:28-31) —
done the TPU way: ONE VMEM-resident pass per row tile computing

    rhs_u = u_adv + (div(sigma_blend) + f_ext_x - dp/dx) / rho
    rhs_v = v_adv + (div(sigma_blend) + f_ext_y - dp/dy) / rho

with the exact stencil closures of the XLA path (pyrmt_tpu/physics.py):
2nd-order central gradients with one-sided boundary rows/columns, 3rd-order
upwind-biased advection with the reference's 1st-order boundary fallbacks.

Tiling: 1D grid over row tiles. Each program reads a (10, T+4, Nx) window —
the ten input fields stacked on a leading axis, with a 2-row halo on each
side assembled from the neighbouring blocks (the same stacked input is passed
three times with block indices i-1 / i / i+1; Pallas clamps out-of-range
block indices, and every value that would be garbage at the domain edge sits
in an unselected branch of a one-sided closure). Columns stay unsplit in
THIS kernel: a full row easily fits VMEM and the x-direction closures then
need no halo logic. The full-RK4 kernel (momentum_rk4.py) reuses the masked
helpers below with global column indices instead, so the 2D shard_map
wrapper can split columns too.

Numerical parity with the jnp path is pinned to ~1e-6 (f32) / 1e-12 (f64,
interpret mode) in tests/test_pallas.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_HALO = 2


def _grad_x(f, dx):
    """Full-width x-gradient, identical closures to fd.grad_central_x_2nd."""
    inv = 1.0 / (2.0 * dx)
    interior = (f[:, 2:] - f[:, :-2]) * inv
    left = (-3.0 * f[:, 0:1] + 4.0 * f[:, 1:2] - f[:, 2:3]) * inv
    right = (3.0 * f[:, -1:] - 4.0 * f[:, -2:-1] + f[:, -3:-2]) * inv
    return jnp.concatenate([left, interior, right], axis=1)


def _sh_y(f, k):
    """Block-local y shift (edge padded; padded rows are never selected)."""
    if k == 0:
        return f
    if k > 0:
        return jnp.concatenate([f[k:, :], jnp.repeat(f[-1:, :], k, axis=0)], axis=0)
    return jnp.concatenate([jnp.repeat(f[0:1, :], -k, axis=0), f[:k, :]], axis=0)


def _grad_y_masked(f, dy, grow, Ny):
    """y-gradient with one-sided closures selected by GLOBAL row index.

    ``grow``: (rows, 1) global row index of each block row (may be negative /
    past Ny in halo rows — those outputs are never used).
    """
    inv = 1.0 / (2.0 * dy)
    central = (_sh_y(f, 1) - _sh_y(f, -1)) * inv
    bottom = (-3.0 * f + 4.0 * _sh_y(f, 1) - _sh_y(f, 2)) * inv
    top = (3.0 * f - 4.0 * _sh_y(f, -1) + _sh_y(f, -2)) * inv
    out = jnp.where(grow == 0, bottom, central)
    return jnp.where(grow == Ny - 1, top, out)


def _upwind_x(f, vel, dx):
    """Full-width 3rd-order upwind x-derivative (same picks as
    fd.diff_upwind_3rd axis=1)."""
    def shx(g, k):
        if k == 0:
            return g
        if k > 0:
            return jnp.concatenate(
                [g[:, k:], jnp.repeat(g[:, -1:], k, axis=1)], axis=1)
        return jnp.concatenate(
            [jnp.repeat(g[:, 0:1], -k, axis=1), g[:, :k]], axis=1)

    fp1, fp2, fm1, fm2 = shx(f, 1), shx(f, 2), shx(f, -1), shx(f, -2)
    inv_h = 1.0 / dx
    backward = (f - fm1) * inv_h
    forward = (fp1 - f) * inv_h
    first = jnp.where(vel > 0, backward, forward)
    inv_6h = 1.0 / (6.0 * dx)
    pos = (2.0 * fp1 + 3.0 * f - 6.0 * fm1 + fm2) * inv_6h
    neg = (-fp2 + 6.0 * fp1 - 3.0 * f - 2.0 * fm1) * inv_6h
    third = jnp.where(vel > 0, pos, neg)

    n = f.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    boundary = (idx < 2) | (idx > n - 3)
    out = jnp.where(boundary, first, third)
    out = jnp.where(idx == 0, forward, out)
    out = jnp.where(idx == n - 1, backward, out)
    return out


def _sh_x(f, k):
    """Block-local x shift (edge padded; padded cols are never selected)."""
    if k == 0:
        return f
    if k > 0:
        return jnp.concatenate(
            [f[:, k:], jnp.repeat(f[:, -1:], k, axis=1)], axis=1)
    return jnp.concatenate(
        [jnp.repeat(f[:, 0:1], -k, axis=1), f[:, :k]], axis=1)


def _grad_x_masked(f, dx, gcol, Nx):
    """x-gradient with one-sided closures selected by GLOBAL column index.

    ``gcol``: (1, cols) global column index of each block column (may be
    negative / past Nx in halo columns under the 2D shard_map wrapper —
    those outputs are never used). With gcol = iota and Nx = f.shape[1]
    this computes exactly ``_grad_x``.
    """
    inv = 1.0 / (2.0 * dx)
    central = (_sh_x(f, 1) - _sh_x(f, -1)) * inv
    left = (-3.0 * f + 4.0 * _sh_x(f, 1) - _sh_x(f, 2)) * inv
    right = (3.0 * f - 4.0 * _sh_x(f, -1) + _sh_x(f, -2)) * inv
    out = jnp.where(gcol == 0, left, central)
    return jnp.where(gcol == Nx - 1, right, out)


def _upwind_x_masked(f, vel, dx, gcol, Nx):
    """3rd-order upwind x-derivative with global-column boundary fallbacks
    (the column twin of ``_upwind_y_masked``)."""
    fp1, fp2, fm1, fm2 = _sh_x(f, 1), _sh_x(f, 2), _sh_x(f, -1), _sh_x(f, -2)
    inv_h = 1.0 / dx
    backward = (f - fm1) * inv_h
    forward = (fp1 - f) * inv_h
    first = jnp.where(vel > 0, backward, forward)
    inv_6h = 1.0 / (6.0 * dx)
    pos = (2.0 * fp1 + 3.0 * f - 6.0 * fm1 + fm2) * inv_6h
    neg = (-fp2 + 6.0 * fp1 - 3.0 * f - 2.0 * fm1) * inv_6h
    third = jnp.where(vel > 0, pos, neg)

    boundary = (gcol < 2) | (gcol > Nx - 3)
    out = jnp.where(boundary, first, third)
    out = jnp.where(gcol == 0, forward, out)
    out = jnp.where(gcol == Nx - 1, backward, out)
    return out


def _upwind_y_masked(f, vel, dy, grow, Ny):
    """3rd-order upwind y-derivative with global-row boundary fallbacks."""
    fp1, fp2, fm1, fm2 = _sh_y(f, 1), _sh_y(f, 2), _sh_y(f, -1), _sh_y(f, -2)
    inv_h = 1.0 / dy
    backward = (f - fm1) * inv_h
    forward = (fp1 - f) * inv_h
    first = jnp.where(vel > 0, backward, forward)
    inv_6h = 1.0 / (6.0 * dy)
    pos = (2.0 * fp1 + 3.0 * f - 6.0 * fm1 + fm2) * inv_6h
    neg = (-fp2 + 6.0 * fp1 - 3.0 * f - 2.0 * fm1) * inv_6h
    third = jnp.where(vel > 0, pos, neg)

    boundary = (grow < 2) | (grow > Ny - 3)
    out = jnp.where(boundary, first, third)
    out = jnp.where(grow == 0, forward, out)
    out = jnp.where(grow == Ny - 1, backward, out)
    return out


def _make_kernel(dx, dy, mu_f, Ny, tile):
    def kernel(prev_ref, cur_ref, next_ref, out_u_ref, out_v_ref):
        t = pl.program_id(0)
        top = prev_ref[:, tile - _HALO :, :]
        bot = next_ref[:, : _HALO, :]
        F = jnp.concatenate([top, cur_ref[...], bot], axis=1)
        (u, v, p, sxx_s, sxy_s, syy_s, Hf, rho, fx, fy) = [
            F[i] for i in range(10)
        ]
        rows = tile + 2 * _HALO
        grow = (
            t * tile
            - _HALO
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        )

        du_dx = _grad_x(u, dx)
        dv_dy = _grad_y_masked(v, dy, grow, Ny)
        du_dy = _grad_y_masked(u, dy, grow, Ny)
        dv_dx = _grad_x(v, dx)

        sig_xx = Hf * (2.0 * mu_f * du_dx) + sxx_s
        sig_yy = Hf * (2.0 * mu_f * dv_dy) + syy_s
        sig_xy = Hf * (mu_f * (du_dy + dv_dx)) + sxy_s

        div_x = _grad_x(sig_xx, dx) + _grad_y_masked(sig_xy, dy, grow, Ny)
        div_y = _grad_x(sig_xy, dx) + _grad_y_masked(sig_yy, dy, grow, Ny)

        u_adv = -u * _upwind_x(u, u, dx) - v * _upwind_y_masked(u, v, dy, grow, Ny)
        v_adv = -u * _upwind_x(v, u, dx) - v * _upwind_y_masked(v, v, dy, grow, Ny)

        dp_dx = _grad_x(p, dx)
        dp_dy = _grad_y_masked(p, dy, grow, Ny)

        inv_rho = 1.0 / (rho + 1e-12)
        rhs_u = u_adv + (div_x + fx - dp_dx) * inv_rho
        rhs_v = v_adv + (div_y + fy - dp_dy) * inv_rho

        out_u_ref[...] = rhs_u[_HALO : _HALO + tile, :]
        out_v_ref[...] = rhs_v[_HALO : _HALO + tile, :]

    return kernel


@partial(
    jax.jit,
    static_argnames=("dx", "dy", "mu_f", "tile", "interpret"),
)
def velocity_rhs_blended_pallas(
    u, v, p, sig_sxx, sig_sxy, sig_syy, dx, dy, mu_f, Hf, rho_local,
    f_ext_x, f_ext_y, tile=32, interpret=False,
):
    """Drop-in fused replacement for physics.velocity_rhs_blended.

    ``sig_s**`` are the pre-blended solid contributions sum_i (1-H_i) sigma_i
    and ``Hf`` the fluid fraction (same contract as the jnp path).
    """
    Ny, Nx = u.shape
    tile = min(tile, Ny)
    while tile >= 8 and Ny % tile:
        tile //= 2
    if Ny % tile or tile < 8:
        # no usable row tiling (e.g. odd Ny like 129): use the XLA path
        from pyrmt_tpu.physics import velocity_rhs_blended

        return velocity_rhs_blended(
            u, v, p, sig_sxx, sig_sxy, sig_syy, dx, dy, mu_f, Hf,
            rho_local, f_ext_x, f_ext_y,
        )
    fxa = f_ext_x if hasattr(f_ext_x, "shape") and f_ext_x.shape == u.shape else (
        jnp.zeros_like(u) + f_ext_x
    )
    fya = f_ext_y if hasattr(f_ext_y, "shape") and f_ext_y.shape == u.shape else (
        jnp.zeros_like(u) + f_ext_y
    )
    stacked = jnp.stack(
        [u, v, p, sig_sxx, sig_sxy, sig_syy, Hf + jnp.zeros_like(u),
         rho_local + jnp.zeros_like(u), fxa, fya]
    )

    grid = (Ny // tile,)
    block = pl.BlockSpec((10, tile, Nx), lambda i: (0, i, 0))
    block_prev = pl.BlockSpec(
        (10, tile, Nx), lambda i: (0, jnp.maximum(i - 1, 0), 0)
    )
    block_next = pl.BlockSpec(
        (10, tile, Nx), lambda i: (0, jnp.minimum(i + 1, grid[0] - 1), 0)
    )
    out_spec = pl.BlockSpec((tile, Nx), lambda i: (i, 0))

    kernel = _make_kernel(float(dx), float(dy), float(mu_f), Ny, tile)
    rhs_u, rhs_v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block_prev, block, block_next],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Ny, Nx), u.dtype),
            jax.ShapeDtypeStruct((Ny, Nx), u.dtype),
        ),
        interpret=interpret,
    )(stacked, stacked, stacked)
    return rhs_u, rhs_v
