"""Pallas TPU kernels: the projection's stencil passes fused around the DCT.

The Neumann incremental projection (ops/projection.py) brackets the DCT
solve with two stencil chains that XLA lowers to many small VPU passes:

  pre-DCT:  Rhie-Chow face velocities -> divergence -> rhs = rho*div/dt
            (capability parity: pyRMT/functions.py:937-992)
  post-DCT: pressure-correction gradient -> velocity correction -> BCs
            (parity: pyRMT/functions.py:994-1010 + :1270-1284)

Each chain becomes ONE VMEM-resident pass per row tile here (2-row halo
from the neighbouring blocks, one-sided closures selected by GLOBAL row
index — the same pattern as kernels/momentum_rhs.py). The arithmetic per
cell matches the composed XLA ops expression-for-expression, so parity is
roundoff-exact (pinned in tests/test_pallas.py, f64 interpret mode).

Constant-rho(-array) Neumann incremental projection only — the periodic and
variable-rho paths keep the XLA formulation (they are CG/FFT-dominated).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrmt_tpu.kernels.momentum_rhs import _sh_y
from pyrmt_tpu.kernels.momentum_rk4 import _apply_bc

_HALO = 2


def _sh_x(f, k):
    if k == 0:
        return f
    if k > 0:
        return jnp.concatenate(
            [f[:, k:], jnp.repeat(f[:, -1:], k, axis=1)], axis=1)
    return jnp.concatenate(
        [jnp.repeat(f[:, 0:1], -k, axis=1), f[:, :k]], axis=1)


def _grad_x_cc(p, dx):
    """Full-width twin of ops.poisson._grad_x_cc (slice closures)."""
    inv = 1.0 / (2.0 * dx)
    interior = (p[:, 2:] - p[:, :-2]) * inv
    left = (-3.0 * p[:, 0:1] + 4.0 * p[:, 1:2] - p[:, 2:3]) * inv
    right = (3.0 * p[:, -1:] - 4.0 * p[:, -2:-1] + p[:, -3:-2]) * inv
    return jnp.concatenate([left, interior, right], axis=1)


def _grad_y_cc_masked(p, dy, grow, Ny):
    """Global-row twin of ops.poisson._grad_y_cc."""
    inv = 1.0 / (2.0 * dy)
    central = (_sh_y(p, 1) - _sh_y(p, -1)) * inv
    bottom = (-3.0 * p + 4.0 * _sh_y(p, 1) - _sh_y(p, 2)) * inv
    top = (3.0 * p - 4.0 * _sh_y(p, -1) + _sh_y(p, -2)) * inv
    out = jnp.where(grow == 0, bottom, central)
    return jnp.where(grow == Ny - 1, top, out)


def _make_rc_rhs_kernel(dx, dy, Ny, Nx, tile):
    def kernel(sc_ref, prev_ref, cur_ref, next_ref, out_ref):
        t = pl.program_id(0)
        dt = sc_ref[0, 0]
        d_scalar = sc_ref[0, 1]
        top = prev_ref[:, tile - _HALO :, :]
        bot = next_ref[:, :_HALO, :]
        F = jnp.concatenate([top, cur_ref[...], bot], axis=1)
        a, b, p, rho = F[0], F[1], F[2], F[3]
        rows = tile + 2 * _HALO
        grow = (
            t * tile - _HALO
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        )
        gcol = jax.lax.broadcasted_iota(jnp.int32, (1, Nx), 1)

        dpdx_cc = _grad_x_cc(p, dx)
        dpdy_cc = _grad_y_cc_masked(p, dy, grow, Ny)

        # face quantities as full-width shifted arrays: index i holds the
        # i+1/2 face; the edge-padded garbage at the last column/row only
        # reaches the zeroed boundary ring
        uf = (0.5 * (a + _sh_x(a, 1))
              - d_scalar * ((_sh_x(p, 1) - p) / dx
                            - 0.5 * (dpdx_cc + _sh_x(dpdx_cc, 1))))
        vf = (0.5 * (b + _sh_y(b, 1))
              - d_scalar * ((_sh_y(p, 1) - p) / dy
                            - 0.5 * (dpdy_cc + _sh_y(dpdy_cc, 1))))
        div = (uf - _sh_x(uf, -1)) / dx + (vf - _sh_y(vf, -1)) / dy

        interior = ((grow > 0) & (grow < Ny - 1)
                    & (gcol > 0) & (gcol < Nx - 1))
        rhs = jnp.where(interior, rho * div / dt, 0.0)
        out_ref[...] = rhs[_HALO : _HALO + tile, :]

    return kernel


def _make_grad_correct_kernel(dx, dy, Ny, Nx, tile, bc_spec):
    def kernel(sc_ref, prev_ref, cur_ref, next_ref, out_u_ref, out_v_ref):
        t = pl.program_id(0)
        dt = sc_ref[0, 0]
        top = prev_ref[:, tile - _HALO :, :]
        bot = next_ref[:, :_HALO, :]
        F = jnp.concatenate([top, cur_ref[...], bot], axis=1)
        pc, a, b, rho = F[0], F[1], F[2], F[3]
        dtype = a.dtype
        rows = tile + 2 * _HALO
        grow = (
            t * tile - _HALO
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        )
        gcol = jax.lax.broadcasted_iota(jnp.int32, (1, Nx), 1)

        # reference boundary quirk (pyRMT/functions.py:994-1010): the
        # non-normal gradient component is zeroed on boundary rows/cols
        row_interior = (grow > 0) & (grow < Ny - 1)
        col_interior = (gcol > 0) & (gcol < Nx - 1)
        col_boundary = (gcol == 0) | (gcol == Nx - 1)
        row_boundary = (grow == 0) | (grow == Ny - 1)
        dpdx = jnp.where(col_boundary | row_interior,
                         _grad_x_cc(pc, dx), 0.0)
        dpdy = jnp.where(row_boundary | col_interior,
                         _grad_y_cc_masked(pc, dy, grow, Ny), 0.0)

        a_new = a - (dt / rho) * dpdx
        b_new = b - (dt / rho) * dpdy
        a_new, b_new = _apply_bc(
            a_new, b_new, bc_spec, grow, gcol, Ny, Nx, dtype)
        out_u_ref[...] = a_new[_HALO : _HALO + tile, :]
        out_v_ref[...] = b_new[_HALO : _HALO + tile, :]

    return kernel


def projection_stencils_supported(velocity_bc, Ny):
    spec = getattr(velocity_bc, "kernel_spec", None)
    if spec is None:
        return False
    t = 64 if Ny % 64 == 0 else 32
    t = min(t, Ny)
    while t >= 8 and Ny % t:
        t //= 2
    return Ny % t == 0 and t >= _HALO


def _tile_for(Ny):
    t = 64 if Ny % 64 == 0 else 32
    t = min(t, Ny)
    while t >= 8 and Ny % t:
        t //= 2
    return t


@partial(jax.jit, static_argnames=("dx", "dy", "interpret"))
def rc_rhs_pallas(a_star, b_star, p_prev, rho, dt, d_scalar, dx, dy,
                  interpret=False):
    """Fused Rhie-Chow divergence + rhs scaling: rho * div_rc / dt.

    ``d_scalar`` is the constant face coefficient dt/mean(rho) (the
    variable-rho path keeps the XLA formulation).
    """
    Ny, Nx = a_star.shape
    t = _tile_for(Ny)
    dtype = a_star.dtype
    stacked = jnp.stack([a_star, b_star, p_prev, rho + jnp.zeros_like(a_star)])
    sc = jnp.stack([jnp.asarray(dt, dtype).reshape(()),
                    jnp.asarray(d_scalar, dtype).reshape(())]).reshape(1, 2)

    grid = (Ny // t,)
    block = pl.BlockSpec((4, t, Nx), lambda i: (0, i, 0))
    block_prev = pl.BlockSpec((4, t, Nx), lambda i: (0, jnp.maximum(i - 1, 0), 0))
    block_next = pl.BlockSpec(
        (4, t, Nx), lambda i: (0, jnp.minimum(i + 1, grid[0] - 1), 0))
    sc_spec = pl.BlockSpec(
        (1, 2), lambda i: (0, 0),
        memory_space=pltpu.SMEM if not interpret else None,
    )
    out_spec = pl.BlockSpec((t, Nx), lambda i: (i, 0))

    kernel = _make_rc_rhs_kernel(float(dx), float(dy), Ny, Nx, t)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sc_spec, block_prev, block, block_next],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Ny, Nx), dtype),
        interpret=interpret,
    )(sc, stacked, stacked, stacked)


@partial(jax.jit, static_argnames=("dx", "dy", "bc_spec", "interpret"))
def grad_correct_pallas(p_corr, a_star, b_star, rho, dt, dx, dy, bc_spec,
                        interpret=False):
    """Fused pressure-correction gradient + velocity correction + BCs."""
    Ny, Nx = a_star.shape
    t = _tile_for(Ny)
    dtype = a_star.dtype
    stacked = jnp.stack([p_corr, a_star, b_star, rho + jnp.zeros_like(a_star)])
    sc = jnp.stack([jnp.asarray(dt, dtype).reshape(()),
                    jnp.zeros((), dtype)]).reshape(1, 2)

    grid = (Ny // t,)
    block = pl.BlockSpec((4, t, Nx), lambda i: (0, i, 0))
    block_prev = pl.BlockSpec((4, t, Nx), lambda i: (0, jnp.maximum(i - 1, 0), 0))
    block_next = pl.BlockSpec(
        (4, t, Nx), lambda i: (0, jnp.minimum(i + 1, grid[0] - 1), 0))
    sc_spec = pl.BlockSpec(
        (1, 2), lambda i: (0, 0),
        memory_space=pltpu.SMEM if not interpret else None,
    )
    out_spec = pl.BlockSpec((t, Nx), lambda i: (i, 0))

    kernel = _make_grad_correct_kernel(float(dx), float(dy), Ny, Nx, t, bc_spec)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[sc_spec, block_prev, block, block_next],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((Ny, Nx), dtype),
                   jax.ShapeDtypeStruct((Ny, Nx), dtype)),
        interpret=interpret,
    )(sc, stacked, stacked, stacked)
