"""Periodic-seam solid behaviour is DEFINED: neither this framework nor the
reference supports a solid crossing the periodic seam (every solid
gather/stencil clamps at the domain edge; the reference's apply_phi_BCs wrap,
pyRMT/functions.py:33-46, is applied only at setup/reinit) — so it is
rejected explicitly at init and detectable in-flight, instead of silently
corrupting the map (round-5, VERDICT r4 #4)."""
import numpy as np

import jax.numpy as jnp
import pytest

from pyrmt_tpu.bcs import periodic_bc
from pyrmt_tpu.grid import Grid
from pyrmt_tpu.sim import (
    RMTConfig,
    make_init_state,
    make_step,
    periodic_seam_clearance_cells,
    solid_near_periodic_seam,
)


def _disc(x0, y0, R):
    return lambda X, Y: jnp.sqrt((X - x0) ** 2 + (Y - y0) ** 2) - R


def _cfg(g, **kw):
    return RMTConfig(grid=g, mu_s=0.05, mu_f=0.01, rho_s=1.0, rho_f=1.0,
                     bc_type="periodic", CFL=0.2, dt_min_cap=1e-3, **kw)


def test_seam_clearance_cells_accounts_for_band_and_guard():
    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    k = periodic_seam_clearance_cells(_cfg(g))
    assert k == 3 + 2 + 2  # num_layers + w_t_cells + stencil reach
    k_bic = periodic_seam_clearance_cells(_cfg(g, sl_interp="bicubic"))
    assert k_bic == 3 + 3 + 2  # band guard (3 cells) wider than w_t band


def test_init_near_seam_raises():
    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    with pytest.raises(ValueError, match="periodic seam"):
        make_init_state(_cfg(g), (_disc(0.08, 0.5, 0.07),),
                        dtype=jnp.float64)
    # clear of the seam: fine
    make_init_state(_cfg(g), (_disc(0.5, 0.5, 0.2),), dtype=jnp.float64)


def test_runtime_seam_predicate():
    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    cfg = _cfg(g)
    k = periodic_seam_clearance_cells(cfg)
    X, Y = g.coords(dtype=jnp.float64)
    centered = _disc(0.5, 0.5, 0.2)(X, Y)[None]
    near = _disc(k * g.dx + 0.03, 0.5, 0.06)(X, Y)[None]
    assert not bool(solid_near_periodic_seam(centered, k))
    assert bool(solid_near_periodic_seam(near, k))


def test_periodic_solid_step_runs_and_stays_clear():
    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    cfg = _cfg(g)
    k = periodic_seam_clearance_cells(cfg)
    phi_init = _disc(0.5, 0.5, 0.2)
    X, Y = g.coords(dtype=jnp.float64)
    u0 = 0.2 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v0 = -0.2 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    step = make_step(cfg, periodic_bc, (phi_init,), dtype=jnp.float64)
    state = make_init_state(cfg, (phi_init,), u0=u0, v0=v0,
                            dtype=jnp.float64)
    for _ in range(3):
        state, aux = step(state, jnp.asarray(10.0))
    assert bool(jnp.all(jnp.isfinite(state.u)))
    assert not bool(solid_near_periodic_seam(aux["phis"], k))
