"""Pallas fused momentum RHS: exact parity with the XLA path.

Runs in interpreter mode on the CPU backend (the same kernel compiles for
TPU; parity on real hardware is exercised by bench/profiling runs).
"""

import pytest

pytestmark = pytest.mark.slow  # full local tier only; fast tier = -m 'not slow'
import numpy as np
import pytest

import jax.numpy as jnp

from pyrmt_tpu.grid import create_grid
from pyrmt_tpu.kernels.momentum_rhs import velocity_rhs_blended_pallas
from pyrmt_tpu.physics import velocity_rhs_blended


def _fields(N, seed=0):
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X, Y = np.asarray(X), np.asarray(Y)
    rng = np.random.default_rng(seed)
    u = 0.1 * np.sin(2 * np.pi * X) * np.cos(np.pi * Y)
    v = 0.1 * np.cos(np.pi * X) * Y
    p = 0.05 * np.cos(np.pi * X) * np.cos(np.pi * Y)
    phi = np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2) - 0.25
    H = 0.5 * (1 + np.tanh(phi / (4 * dx)))
    sxx = (1 - H) * (1.0 + 0.1 * np.sin(3 * X))
    sxy = (1 - H) * 0.05 * np.cos(2 * Y)
    syy = (1 - H) * (1.0 - 0.1 * X * Y)
    rho = 1.0 + 0.2 * H
    fx = 0.01 * rng.standard_normal((N, N))
    fy = 0.01 * rng.standard_normal((N, N))
    return dx, dy, u, v, p, sxx, sxy, syy, H, rho, fx, fy


@pytest.mark.parametrize("N", [64, 96])
def test_pallas_rhs_matches_xla_path(N):
    dx, dy, u, v, p, sxx, sxy, syy, H, rho, fx, fy = _fields(N)
    mu_f = 0.01
    ru_ref, rv_ref = velocity_rhs_blended(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(p), jnp.asarray(sxx),
        jnp.asarray(sxy), jnp.asarray(syy), dx, dy, mu_f, jnp.asarray(H),
        jnp.asarray(rho), jnp.asarray(fx), jnp.asarray(fy))
    ru, rv = velocity_rhs_blended_pallas(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(p), jnp.asarray(sxx),
        jnp.asarray(sxy), jnp.asarray(syy), dx, dy, mu_f, jnp.asarray(H),
        jnp.asarray(rho), jnp.asarray(fx), jnp.asarray(fy),
        tile=32, interpret=True)
    assert np.allclose(np.asarray(ru), np.asarray(ru_ref), atol=1e-12)
    assert np.allclose(np.asarray(rv), np.asarray(rv_ref), atol=1e-12)


def test_pallas_rhs_odd_grid_falls_back():
    """Odd grids (no row tiling) transparently use the XLA path."""
    N = 65
    dx, dy, u, v, p, sxx, sxy, syy, H, rho, fx, fy = _fields(N)
    ru, rv = velocity_rhs_blended_pallas(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(p), jnp.asarray(sxx),
        jnp.asarray(sxy), jnp.asarray(syy), dx, dy, 0.01, jnp.asarray(H),
        jnp.asarray(rho), jnp.asarray(fx), jnp.asarray(fy), interpret=True)
    ru_ref, rv_ref = velocity_rhs_blended(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(p), jnp.asarray(sxx),
        jnp.asarray(sxy), jnp.asarray(syy), dx, dy, 0.01, jnp.asarray(H),
        jnp.asarray(rho), jnp.asarray(fx), jnp.asarray(fy))
    assert np.allclose(np.asarray(ru), np.asarray(ru_ref), atol=0)
    assert np.allclose(np.asarray(rv), np.asarray(rv_ref), atol=0)


@pytest.mark.parametrize("bc_name", ["lid", "free_slip"])
def test_pallas_full_rk4_matches_xla_path(bc_name):
    """The fused full-RK4 momentum kernel (4 stages + per-stage BCs +
    Kelvin-Voigt in one pass) equals momentum_step_rk4_multi to roundoff."""
    import functools

    import pyrmt_tpu.kernels.momentum_rk4 as mk
    from pyrmt_tpu.bcs import free_slip_box_bc, make_lid_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.physics import momentum_step_rk4_multi

    N = 64
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    X, Y = g.coords(dtype=jnp.float64)
    u = 0.1 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.1 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    p = 0.05 * jnp.cos(jnp.pi * X) * jnp.cos(jnp.pi * Y)
    phi = jnp.sqrt((X - 0.6) ** 2 + (Y - 0.5) ** 2) - 0.2
    mask = (phi <= 0).astype(jnp.float64)
    X1, X2 = X * mask, Y * mask
    bc = make_lid_bc(1.0) if bc_name == "lid" else free_slip_box_bc

    kwargs = dict(mu_s=0.1, kappa=0.0, eta_s=0.01, dx=g.dx, dy=g.dy,
                  dt=1e-3, rho_s=1.0, rho_f=1.0, mu_f=0.01, w_t=2.0 * g.dx)
    ux, vx, *_ = momentum_step_rk4_multi(
        u, v, p, X1[None], X2[None], phi[None], bc, **kwargs)

    orig = mk.momentum_rk4_pallas
    mk.momentum_rk4_pallas = functools.partial(orig, interpret=True)
    try:
        up, vp, *_ = momentum_step_rk4_multi(
            u, v, p, X1[None], X2[None], phi[None], bc,
            use_pallas_rk4=True, **kwargs)
    finally:
        mk.momentum_rk4_pallas = orig
    assert np.allclose(np.asarray(ux), np.asarray(up), atol=1e-13)
    assert np.allclose(np.asarray(vx), np.asarray(vp), atol=1e-13)


@pytest.mark.parametrize("eta_s", [0.0, 0.01])
def test_pallas_full_rk4_field_elision(eta_s):
    """``has_ext=False`` (zero external force) and ``eta_s == 0`` (no
    Kelvin-Voigt) statically drop kernel input fields; the elided kernel
    must equal both the full kernel fed explicit zeros and the XLA path."""
    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.kernels.momentum_rk4 import momentum_rk4_pallas
    from pyrmt_tpu.physics import momentum_core

    N = 64
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    X, Y = g.coords(dtype=jnp.float64)
    u = 0.1 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.1 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    p = 0.05 * jnp.cos(jnp.pi * X) * jnp.cos(jnp.pi * Y)
    phi = jnp.sqrt((X - 0.6) ** 2 + (Y - 0.5) ** 2) - 0.2
    H = 0.5 * (1 + jnp.tanh(phi / (2 * g.dx)))
    one_m = 1.0 - H
    sxx = one_m * (1.0 + 0.1 * jnp.sin(3 * X))
    sxy = one_m * 0.05 * jnp.cos(2 * Y)
    syy = one_m * (1.0 - 0.1 * X * Y)
    rho = H * 1.0 + one_m * 1.2
    mkv = (phi <= 0).astype(jnp.float64) * one_m
    zero = jnp.zeros_like(u)
    bc = make_lid_bc(1.0)
    args = dict(dt=1e-3, dx=g.dx, dy=g.dy, mu_f=0.01, eta_s=eta_s)

    u_el, v_el = momentum_rk4_pallas(
        u, v, p, sxx, sxy, syy, H, rho, zero, zero, mkv,
        bc_spec=bc.kernel_spec, has_ext=False, interpret=True, **args)
    u_full, v_full = momentum_rk4_pallas(
        u, v, p, sxx, sxy, syy, H, rho, zero, zero, mkv,
        bc_spec=bc.kernel_spec, has_ext=True, interpret=True, **args)
    u_xla, v_xla = momentum_core(
        u, v, p, sxx, sxy, syy, H, rho, zero, zero, mkv, bc, **args)

    assert np.allclose(np.asarray(u_el), np.asarray(u_full), atol=0)
    assert np.allclose(np.asarray(v_el), np.asarray(v_full), atol=0)
    assert np.allclose(np.asarray(u_el), np.asarray(u_xla), atol=1e-13)
    assert np.allclose(np.asarray(v_el), np.asarray(v_xla), atol=1e-13)


def test_rmt_block_fused_matches_composed_ops():
    """The fused advect->extrapolate->rebuild->stress->blend kernel equals
    the composed XLA ops to roundoff (one step), and a full sim step through
    the fused path stays machine-exact vs the XLA path."""
    import dataclasses
    import functools

    import pyrmt_tpu.kernels.rmt_block as rb
    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.ops.advect import advect_semilagrangian_rk4_local
    from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map
    from pyrmt_tpu.ops.stress import solid_cauchy_stress
    from pyrmt_tpu.sim import RMTConfig, make_init_state, make_step

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.6) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.1, eta_s=0.01, rho_s=1.0, mu_f=0.01,
                    rho_f=1.0, num_layers=3, CFL=0.2, dt_min_cap=1e-3)
    state = make_init_state(cfg, (phi_init,), dtype=jnp.float64)
    X, Y = g.coords(dtype=jnp.float64)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 1e-3

    phis = jnp.stack([phi_init(state.X1[0], state.X2[0])])
    mask = (phis[0] <= 0.0).astype(jnp.float64)
    qs = jnp.concatenate([state.X1, state.X2], axis=0)
    qs_new = advect_semilagrangian_rk4_local(qs, u, v, dt, g.dx, g.dy)
    X1e, X2e = extrapolate_reference_map(
        qs_new[0] * mask, qs_new[1] * mask, phis[0], g.dx, g.dy, 3)
    phi2 = phi_init(X1e, X2e)
    sxx, _, _, J = solid_cauchy_stress(
        X1e, X2e, g.dx, g.dy, 0.1, 0.0, phi2, w_cut=0.0, detg_clamp=0.0)

    out = rb.rmt_block_fused(
        u, v, state.X1, state.X2, dt, phi_inits=(phi_init,), dx=g.dx,
        dy=g.dy, num_layers=3, w_t=cfg.w_t, mu_s=0.1, kappa=0.0, rho_s=1.0,
        rho_f=1.0, interpret=True)
    kX1e, kX2e, kphi, ksxx = out[0], out[1], out[2], out[3]
    kJ = out[6]
    assert np.allclose(np.asarray(X1e), np.asarray(kX1e[0]), atol=1e-13)
    assert np.allclose(np.asarray(X2e), np.asarray(kX2e[0]), atol=1e-13)
    assert np.allclose(np.asarray(phi2), np.asarray(kphi[0]), atol=1e-13)
    assert np.allclose(np.asarray(sxx), np.asarray(ksxx[0]), atol=1e-13)
    assert np.allclose(np.asarray(J), np.asarray(kJ[0]), atol=1e-12)

    # full sim step through the fused path
    orig = rb.rmt_block_fused
    rb.rmt_block_fused = functools.partial(orig, interpret=True)
    try:
        bc = make_lid_bc(1.0)
        t_end = jnp.asarray(1.0, jnp.float64)
        step_x = make_step(dataclasses.replace(cfg, rmt_method="xla"),
                           bc, (phi_init,), dtype=jnp.float64)
        step_p = make_step(dataclasses.replace(cfg, rmt_method="pallas"),
                           bc, (phi_init,), dtype=jnp.float64)
        sx, sp = state, state
        for _ in range(3):
            sx, _ = step_x(sx, t_end)
            sp, _ = step_p(sp, t_end)
        assert np.allclose(np.asarray(sx.u), np.asarray(sp.u), atol=1e-14)
        assert np.allclose(np.asarray(sx.p), np.asarray(sp.p), atol=1e-13)
        assert np.allclose(np.asarray(sx.X1), np.asarray(sp.X1), atol=1e-13)
    finally:
        rb.rmt_block_fused = orig


def test_rmt_block_nonslab_halo_fallback_parity():
    """When ``slab_halo=True`` is requested but the stencil halo does not
    divide the row tile (num_layers=2 -> halo=12, tile=32), the kernel falls
    back from halo-row slab operands to full neighbour-block operands — that
    fallback must match the composed XLA ops exactly too."""
    from pyrmt_tpu.kernels.rmt_block import rmt_block_fused
    from pyrmt_tpu.ops.advect import advect_semilagrangian_rk4_local
    from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map
    from pyrmt_tpu.ops.stress import solid_cauchy_stress

    Ny = Nx = 64
    phi_init = lambda X, Y: jnp.sqrt((X - 0.6) ** 2 + (Y - 0.5) ** 2) - 0.2
    dx = dy = 1.0 / (Nx - 1)
    X, Y = jnp.meshgrid(jnp.arange(Nx) * dx, jnp.arange(Ny) * dy)
    phi0 = phi_init(X, Y)
    mask = (phi0 <= 0.0).astype(jnp.float64)
    X1, X2 = extrapolate_reference_map(X * mask, Y * mask, phi0, dx, dy, 2)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 1e-3

    phis = phi_init(X1, X2)
    m = (phis <= 0.0).astype(jnp.float64)
    qs = jnp.stack([X1, X2])
    qs_new = advect_semilagrangian_rk4_local(qs, u, v, dt, dx, dy)
    X1e, X2e = extrapolate_reference_map(
        qs_new[0] * m, qs_new[1] * m, phis, dx, dy, 2)
    phi2 = phi_init(X1e, X2e)
    sxx, _, _, J = solid_cauchy_stress(
        X1e, X2e, dx, dy, 0.1, 0.0, phi2, w_cut=0.0, detg_clamp=0.0)

    out = rmt_block_fused(
        u, v, X1[None], X2[None], dt, phi_inits=(phi_init,), dx=dx, dy=dy,
        num_layers=2, w_t=1.0 * dx, mu_s=0.1, kappa=0.0, rho_s=1.0,
        rho_f=1.0, slab_halo=True, interpret=True)
    assert np.allclose(np.asarray(X1e), np.asarray(out[0][0]), atol=1e-13)
    assert np.allclose(np.asarray(X2e), np.asarray(out[1][0]), atol=1e-13)
    assert np.allclose(np.asarray(phi2), np.asarray(out[2][0]), atol=1e-13)
    assert np.allclose(np.asarray(sxx), np.asarray(out[3][0]), atol=1e-13)
    assert np.allclose(np.asarray(J), np.asarray(out[6][0]), atol=1e-12)


def test_slab_halo_operand_parity():
    """``slab_halo=True`` (halo-row slab input operands: tile + 2h DMA rows
    instead of 3*tile) must equal the full neighbour-block operands BITWISE
    in both fused kernels — the slab changes only which never-consumed
    out-of-domain halo rows the edge tiles see (f64 interpret mode)."""
    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.kernels.momentum_rk4 import momentum_rk4_pallas
    from pyrmt_tpu.kernels.rmt_block import rmt_block_fused

    Ny = Nx = 128
    # disc near the TOP edge so an edge tile runs the full pipeline and
    # actually reads its (clamped) out-of-domain halo rows
    phi_init = (
        lambda X, Y: jnp.sqrt((X - 0.5) ** 2 + (Y - 0.06) ** 2) - 0.1)
    dx = dy = 1.0 / (Nx - 1)
    X, Y = jnp.meshgrid(jnp.arange(Nx) * dx, jnp.arange(Ny) * dy)
    X1 = (X + 0.003 * jnp.sin(2 * jnp.pi * Y)).astype(jnp.float64)
    X2 = (Y - 0.002 * jnp.cos(2 * jnp.pi * X)).astype(jnp.float64)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 0.2 * dx / 0.3

    # RMT block: num_layers=3 -> halo=16 divides tile=32 -> slab active
    kw = dict(phi_inits=(phi_init,), dx=dx, dy=dy, num_layers=3, w_t=3 * dx,
              mu_s=0.1, kappa=1.0, rho_s=1.0, rho_f=1.0, stress_w_cut=3 * dx,
              stress_clamp=4.0, interpret=True)
    full = rmt_block_fused(u, v, X1[None], X2[None], dt,
                           slab_halo=False, **kw)
    slab = rmt_block_fused(u, v, X1[None], X2[None], dt,
                           slab_halo=True, **kw)
    for x, y in zip(slab, full):
        assert float(jnp.max(jnp.abs(x - y))) == 0.0

    # momentum kernel: _HALO=8 divides tile (64 at Ny=128) -> slab active
    phi = phi_init(X1, X2)
    H = 0.5 * (1 + jnp.tanh(phi / (2 * dx)))
    one_m = 1.0 - H
    p = 0.05 * jnp.cos(jnp.pi * X) * jnp.cos(jnp.pi * Y)
    sxx = one_m * (1.0 + 0.1 * jnp.sin(3 * X))
    sxy = one_m * 0.05 * jnp.cos(2 * Y)
    syy = one_m * (1.0 - 0.1 * X * Y)
    rho = H * 1.0 + one_m * 1.2
    mkv = (phi <= 0).astype(jnp.float64) * one_m
    fx = 0.01 * jnp.sin(jnp.pi * X) * one_m
    fy = -0.01 * jnp.cos(jnp.pi * Y) * one_m
    bc = make_lid_bc(1.0)
    margs = dict(dt=1e-3, dx=dx, dy=dy, mu_f=0.01, eta_s=0.01,
                 bc_spec=bc.kernel_spec, interpret=True)
    uf, vf = momentum_rk4_pallas(
        u, v, p, sxx, sxy, syy, H, rho, fx, fy, mkv,
        slab_halo=False, **margs)
    us, vs = momentum_rk4_pallas(
        u, v, p, sxx, sxy, syy, H, rho, fx, fy, mkv,
        slab_halo=True, **margs)
    assert float(jnp.max(jnp.abs(us - uf))) == 0.0
    assert float(jnp.max(jnp.abs(vs - vf))) == 0.0


def test_rmt_block_tile_skip_exact():
    """The tile-activity skip (solid-free row tiles take the cheap branch)
    is numerically EXACT: with an off-center disc leaving half the row
    tiles solid-free, tile_skip=True equals tile_skip=False bitwise on all
    12 outputs (f64 interpret mode)."""
    from pyrmt_tpu.kernels.rmt_block import rmt_block_fused

    Ny = Nx = 128
    phi_init = (
        lambda X, Y: jnp.sqrt((X - 0.5) ** 2 + (Y - 0.125) ** 2) - 0.1)
    dx = dy = 1.0 / (Nx - 1)
    X, Y = jnp.meshgrid(jnp.arange(Nx) * dx, jnp.arange(Ny) * dy)
    X1 = (X + 0.003 * jnp.sin(2 * jnp.pi * Y)).astype(jnp.float64)
    X2 = (Y - 0.002 * jnp.cos(2 * jnp.pi * X)).astype(jnp.float64)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 0.2 * dx / 0.3

    # solid occupies rows ~3..28 only: tiles 2 and 3 (of 4) are solid-free
    phi = np.asarray(phi_init(X1, X2))
    act = np.where((phi <= 0).any(axis=1))[0]
    assert act.max() < 2 * 32 - 16, "setup must leave skippable tiles"

    kw = dict(phi_inits=(phi_init,), dx=dx, dy=dy, num_layers=3, w_t=3 * dx,
              mu_s=0.1, kappa=1.0, rho_s=1.0, rho_f=1.0, stress_w_cut=3 * dx,
              stress_clamp=4.0, interpret=True)
    a = rmt_block_fused(u, v, X1[None], X2[None], dt, tile_skip=True, **kw)
    b = rmt_block_fused(u, v, X1[None], X2[None], dt, tile_skip=False, **kw)
    for x, y in zip(a, b):
        assert float(jnp.max(jnp.abs(x - y))) == 0.0


def test_rmt_block_multi_panel_parity():
    """The multi-panel column path (panel_width < Nx: lo/hi/o0 slicing,
    per-panel tile skip) only activates by default at Nx > 1024; pin it at
    test scale via the injectable panel_width. With 32-wide panels and a
    disc centred at x=0.5, the outer column panels are solid-free, so the
    per-panel skip takes both branches. Multi-panel output must equal the
    single-panel kernel BITWISE (whose own parity vs the composed XLA ops
    is pinned above), with tile_skip on and off (f64 interpret mode)."""
    from pyrmt_tpu.kernels.rmt_block import rmt_block_fused

    Ny = Nx = 128
    phi_init = (
        lambda X, Y: jnp.sqrt((X - 0.5) ** 2 + (Y - 0.125) ** 2) - 0.1)
    dx = dy = 1.0 / (Nx - 1)
    X, Y = jnp.meshgrid(jnp.arange(Nx) * dx, jnp.arange(Ny) * dy)
    X1 = (X + 0.003 * jnp.sin(2 * jnp.pi * Y)).astype(jnp.float64)
    X2 = (Y - 0.002 * jnp.cos(2 * jnp.pi * X)).astype(jnp.float64)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 0.2 * dx / 0.3

    # the disc spans columns ~38..90: panels 0 and 3 (of 4) are solid-free
    phi = np.asarray(phi_init(X1, X2))
    cols = np.where((phi <= 0).any(axis=0))[0]
    assert cols.min() > 32 and cols.max() < 96, "setup must leave skippable panels"

    kw = dict(phi_inits=(phi_init,), dx=dx, dy=dy, num_layers=3, w_t=3 * dx,
              mu_s=0.1, kappa=1.0, rho_s=1.0, rho_f=1.0, stress_w_cut=3 * dx,
              stress_clamp=4.0, interpret=True)
    single = rmt_block_fused(u, v, X1[None], X2[None], dt,
                             tile_skip=False, **kw)
    for skip in (True, False):
        multi = rmt_block_fused(u, v, X1[None], X2[None], dt,
                                tile_skip=skip, panel_width=32, **kw)
        for x, y in zip(multi, single):
            assert float(jnp.max(jnp.abs(x - y))) == 0.0


def test_projection_stencil_kernels_match_xla_ops():
    """The fused pre-DCT (Rhie-Chow divergence -> rhs) and post-DCT
    (gradient -> correction -> BC) Pallas passes equal the composed XLA ops
    to roundoff (f64 interpret), and a full sim step with
    projection_method='pallas' is machine-exact vs 'xla'."""
    import dataclasses

    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.kernels.projection_stencils import (
        grad_correct_pallas,
        rc_rhs_pallas,
    )
    from pyrmt_tpu.ops.poisson import (
        compute_divergence_rc,
        compute_pressure_gradient,
    )
    from pyrmt_tpu.sim import RMTConfig, make_init_state, make_step

    N = 64
    dx = dy = 1.0 / (N - 1)
    x = jnp.arange(N, dtype=jnp.float64) * dx
    X, Y = jnp.meshgrid(x, x)
    a = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(3 * jnp.pi * Y)
    b = -0.2 * jnp.cos(3 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    p = 0.1 * jnp.cos(jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    rho = 1.0 + 0.0 * X  # constant-rho array (the fused path's contract)
    dt = 1.3e-3
    d_scalar = dt / jnp.mean(rho)

    rhs_ref = rho * compute_divergence_rc(
        a, b, p, dt, rho, dx, dy, variable_rho=False) / dt
    rhs_k = rc_rhs_pallas(a, b, p, rho, dt, d_scalar, dx, dy, interpret=True)
    assert np.allclose(np.asarray(rhs_k), np.asarray(rhs_ref), atol=1e-13)

    bc = make_lid_bc(1.0)
    dpdx, dpdy = compute_pressure_gradient(p, dx, dy)
    a_ref = a - (dt / rho) * dpdx
    b_ref = b - (dt / rho) * dpdy
    a_ref, b_ref = bc(a_ref, b_ref)
    a_k, b_k = grad_correct_pallas(p, a, b, rho, dt, dx, dy,
                                   bc.kernel_spec, interpret=True)
    assert np.allclose(np.asarray(a_k), np.asarray(a_ref), atol=1e-13)
    assert np.allclose(np.asarray(b_k), np.asarray(b_ref), atol=1e-13)

    # full-step pin: pallas projection vs xla projection over 3 FSI steps
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    phi_init = lambda Xq, Yq: jnp.sqrt((Xq - 0.6) ** 2 + (Yq - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.1, eta_s=0.01, rho_s=1.0, mu_f=0.01,
                    rho_f=1.0, num_layers=3, CFL=0.2, dt_min_cap=1e-3)
    state = make_init_state(cfg, (phi_init,), dtype=jnp.float64)
    step_x = make_step(dataclasses.replace(cfg, projection_method="xla"),
                       bc, (phi_init,), dtype=jnp.float64)
    step_p = make_step(dataclasses.replace(cfg, projection_method="pallas"),
                       bc, (phi_init,), dtype=jnp.float64)
    t_end = jnp.asarray(1.0, jnp.float64)
    sx, sp = state, state
    for _ in range(3):
        sx, _ = step_x(sx, t_end)
        sp, _ = step_p(sp, t_end)
    assert np.allclose(np.asarray(sx.u), np.asarray(sp.u), atol=1e-14)
    assert np.allclose(np.asarray(sx.v), np.asarray(sp.v), atol=1e-14)
    assert np.allclose(np.asarray(sx.p), np.asarray(sp.p), atol=1e-13)


def test_pallas_full_rk4_nonzero_external_force():
    """has_ext=True with a NONZERO body force (the buoyancy/gravity and
    CSF/contact production path) must equal the XLA RK4 to roundoff."""
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.kernels.momentum_rk4 import momentum_rk4_pallas
    from pyrmt_tpu.physics import momentum_core

    N = 64
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    X, Y = g.coords(dtype=jnp.float64)
    u = 0.1 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.1 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    p = 0.05 * jnp.cos(jnp.pi * X) * jnp.cos(jnp.pi * Y)
    phi = jnp.sqrt((X - 0.6) ** 2 + (Y - 0.5) ** 2) - 0.2
    H = 0.5 * (1 + jnp.tanh(phi / (2 * g.dx)))
    one_m = 1.0 - H
    sxx = one_m * (1.0 + 0.1 * jnp.sin(3 * X))
    sxy = one_m * 0.05 * jnp.cos(2 * Y)
    syy = one_m * (1.0 - 0.1 * X * Y)
    rho = H * 1.0 + one_m * 10.0
    fx = 0.02 * jnp.sin(jnp.pi * X)       # CSF-shaped
    fy = (rho - 1.0) * (-1.0)             # buoyancy-shaped
    mkv = jnp.zeros_like(u)
    bc = free_slip_box_bc
    args = dict(dt=1e-3, dx=g.dx, dy=g.dy, mu_f=0.01, eta_s=0.0)

    u_k, v_k = momentum_rk4_pallas(
        u, v, p, sxx, sxy, syy, H, rho, fx, fy, mkv,
        bc_spec=bc.kernel_spec, has_ext=True, interpret=True, **args)
    u_x, v_x = momentum_core(
        u, v, p, sxx, sxy, syy, H, rho, fx, fy, mkv, bc, **args)

    assert np.allclose(np.asarray(u_k), np.asarray(u_x), atol=1e-13)
    assert np.allclose(np.asarray(v_k), np.asarray(v_x), atol=1e-13)


def test_rmt_block_fused_bicubic_matches_composed_ops():
    """Round-4: the fused RMT block with the BICUBIC final gather (band-
    guarded and raw) equals the composed XLA ops to roundoff, including a
    solid overlapping the domain edge (the kernel's explicit global-index
    stencil clipping must reproduce the XLA edge-pad replication bitwise),
    and a full sim step through the fused bicubic path stays machine-exact
    vs the XLA path."""
    import dataclasses
    import functools

    import pyrmt_tpu.kernels.rmt_block as rb
    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.ops.advect import advect_semilagrangian_rk4_local
    from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map
    from pyrmt_tpu.ops.stress import solid_cauchy_stress
    from pyrmt_tpu.sim import RMTConfig, make_init_state, make_step

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    # overlaps the right domain edge: exercises the clipped stencil taps
    phi_init = lambda X, Y: jnp.sqrt((X - 0.85) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.1, eta_s=0.01, rho_s=1.0, mu_f=0.01,
                    rho_f=1.0, num_layers=3, CFL=0.2, dt_min_cap=1e-3,
                    sl_interp="bicubic")
    state = make_init_state(cfg, (phi_init,), dtype=jnp.float64)
    X, Y = g.coords(dtype=jnp.float64)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 1e-3

    phis = jnp.stack([phi_init(state.X1[0], state.X2[0])])
    mask = (phis[0] <= 0.0).astype(jnp.float64)
    qs = jnp.concatenate([state.X1, state.X2], axis=0)
    for guard in (3.0, None):  # band-guarded and raw bicubic
        if guard is not None:
            m = phis < (-guard * max(g.dx, g.dy))
            cubic_mask = jnp.concatenate([m, m], axis=0)
            sl_guard = guard * max(g.dx, g.dy)
        else:
            cubic_mask = None
            sl_guard = None
        qs_new = advect_semilagrangian_rk4_local(
            qs, u, v, dt, g.dx, g.dy, interp="bicubic",
            cubic_mask=cubic_mask)
        X1e, X2e = extrapolate_reference_map(
            qs_new[0] * mask, qs_new[1] * mask, phis[0], g.dx, g.dy, 3)
        phi2 = phi_init(X1e, X2e)
        sxx, _, _, J = solid_cauchy_stress(
            X1e, X2e, g.dx, g.dy, 0.1, 0.0, phi2, w_cut=0.0, detg_clamp=0.0)

        out = rb.rmt_block_fused(
            u, v, state.X1, state.X2, dt, phi_inits=(phi_init,), dx=g.dx,
            dy=g.dy, num_layers=3, w_t=cfg.w_t, mu_s=0.1, kappa=0.0,
            rho_s=1.0, rho_f=1.0, sl_interp="bicubic", sl_guard=sl_guard,
            interpret=True)
        assert np.allclose(np.asarray(X1e), np.asarray(out[0][0]), atol=1e-13)
        assert np.allclose(np.asarray(X2e), np.asarray(out[1][0]), atol=1e-13)
        assert np.allclose(np.asarray(phi2), np.asarray(out[2][0]), atol=1e-13)
        assert np.allclose(np.asarray(sxx), np.asarray(out[3][0]), atol=1e-13)
        assert np.allclose(np.asarray(J), np.asarray(out[6][0]), atol=1e-12)

    # full sim step through the fused bicubic path (default band guard)
    orig = rb.rmt_block_fused
    rb.rmt_block_fused = functools.partial(orig, interpret=True)
    try:
        bc = make_lid_bc(1.0)
        t_end = jnp.asarray(1.0, jnp.float64)
        step_x = make_step(dataclasses.replace(cfg, rmt_method="xla"),
                           bc, (phi_init,), dtype=jnp.float64)
        step_p = make_step(dataclasses.replace(cfg, rmt_method="pallas"),
                           bc, (phi_init,), dtype=jnp.float64)
        sx, sp = state, state
        for _ in range(3):
            sx, _ = step_x(sx, t_end)
            sp, _ = step_p(sp, t_end)
        assert np.allclose(np.asarray(sx.u), np.asarray(sp.u), atol=1e-14)
        assert np.allclose(np.asarray(sx.p), np.asarray(sp.p), atol=1e-13)
        assert np.allclose(np.asarray(sx.X1), np.asarray(sp.X1), atol=1e-13)
    finally:
        rb.rmt_block_fused = orig


def test_rmt_block_bicubic_multi_panel_parity():
    """Bicubic fused path: multi-panel output equals the single-panel
    kernel bitwise (panel-edge staleness must stay outside the consumed
    window with the wider bicubic stencil too)."""
    from pyrmt_tpu.kernels.rmt_block import rmt_block_fused

    Ny = Nx = 128
    phi_init = (
        lambda X, Y: jnp.sqrt((X - 0.5) ** 2 + (Y - 0.125) ** 2) - 0.1)
    dx = dy = 1.0 / (Nx - 1)
    X, Y = jnp.meshgrid(jnp.arange(Nx) * dx, jnp.arange(Ny) * dy)
    X1 = (X + 0.003 * jnp.sin(2 * jnp.pi * Y)).astype(jnp.float64)
    X2 = (Y - 0.002 * jnp.cos(2 * jnp.pi * X)).astype(jnp.float64)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 0.2 * dx / 0.3

    kw = dict(phi_inits=(phi_init,), dx=dx, dy=dy, num_layers=3, w_t=3 * dx,
              mu_s=0.1, kappa=1.0, rho_s=1.0, rho_f=1.0, stress_w_cut=3 * dx,
              stress_clamp=4.0, sl_interp="bicubic", sl_guard=3 * dx,
              interpret=True)
    single = rmt_block_fused(u, v, X1[None], X2[None], dt,
                             tile_skip=False, **kw)
    for skip in (True, False):
        multi = rmt_block_fused(u, v, X1[None], X2[None], dt,
                                tile_skip=skip, panel_width=32, **kw)
        for x, y in zip(multi, single):
            assert float(jnp.max(jnp.abs(x - y))) == 0.0


def _split_step_pair(cfg, phi_inits, u0=None, v0=None):
    """Build (XLA step, split-fused step, init state) for a config on the
    split tier, with kernel A forced into interpret mode."""
    import dataclasses
    import functools

    import pyrmt_tpu.kernels.rmt_block as rb
    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.sim import (
        make_init_state,
        make_step,
        rmt_block_split_eligible,
    )

    assert rmt_block_split_eligible(cfg, len(phi_inits))
    bc = make_lid_bc(1.0)
    state = make_init_state(cfg, phi_inits, u0=u0, v0=v0, dtype=jnp.float64)
    orig = rb.advext_block_fused
    rb.advext_block_fused = functools.partial(orig, interpret=True)

    def restore():
        rb.advext_block_fused = orig

    step_x = make_step(dataclasses.replace(cfg, rmt_method="xla"),
                       bc, phi_inits, dtype=jnp.float64)
    step_p = make_step(dataclasses.replace(cfg, rmt_method="pallas"),
                       bc, phi_inits, dtype=jnp.float64)
    return step_x, step_p, state, restore


def _assert_split_matches(cfg, phi_inits, n_steps=3, u0=None, v0=None,
                          check_aux=()):
    t_end = jnp.asarray(1.0, jnp.float64)
    step_x, step_p, state, restore = _split_step_pair(
        cfg, phi_inits, u0=u0, v0=v0)
    try:
        sx, sp = state, state
        for _ in range(n_steps):
            sx, ax = step_x(sx, t_end)
            sp, ap = step_p(sp, t_end)
        assert np.allclose(np.asarray(sx.u), np.asarray(sp.u), atol=1e-13)
        assert np.allclose(np.asarray(sx.v), np.asarray(sp.v), atol=1e-13)
        assert np.allclose(np.asarray(sx.p), np.asarray(sp.p), atol=1e-12)
        assert np.allclose(np.asarray(sx.X1), np.asarray(sp.X1), atol=1e-13)
        assert np.allclose(np.asarray(sx.X2), np.asarray(sp.X2), atol=1e-13)
        assert np.allclose(np.asarray(sx.phis0), np.asarray(sp.phis0),
                           atol=1e-13)
        for k in check_aux:
            assert np.allclose(np.asarray(ax[k]), np.asarray(ap[k]),
                               atol=1e-12), k
        return sx, sp
    finally:
        restore()


def _tg_u0(g):
    X, Y = g.coords(dtype=jnp.float64)
    u = 0.4 * jnp.sin(jnp.pi * X) * jnp.cos(jnp.pi * Y)
    v = -0.4 * jnp.cos(jnp.pi * X) * jnp.sin(jnp.pi * Y)
    return u, v


def test_split_tier_area_fix_matches_xla():
    """Split tier (kernel A + XLA phi chain): phi_area_fix config equals the
    pure-XLA path to roundoff over multi-step runs (VERDICT r4 #1)."""
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.sim import RMTConfig

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.55) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.05, rho_s=1.0, mu_f=0.01, rho_f=1.0,
                    num_layers=3, CFL=0.2, dt_min_cap=1e-3,
                    phi_area_fix=True)
    u0, v0 = _tg_u0(g)
    _assert_split_matches(cfg, (phi_init,), u0=u0, v0=v0,
                          check_aux=("phis", "J", "sxx"))


def test_split_tier_reinit_matches_xla():
    """Split tier with per-step reinitialisation ('pde' and 'fmm')."""
    import dataclasses

    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.sim import RMTConfig

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.55) ** 2 + (Y - 0.5) ** 2) - 0.2
    base = RMTConfig(grid=g, mu_s=0.05, rho_s=1.0, mu_f=0.01, rho_f=1.0,
                     num_layers=3, CFL=0.2, dt_min_cap=1e-3,
                     reinit_method="pde", reinit_iters=5)
    u0, v0 = _tg_u0(g)
    _assert_split_matches(base, (phi_init,), u0=u0, v0=v0,
                          check_aux=("phis",))
    _assert_split_matches(
        dataclasses.replace(base, reinit_method="fmm"), (phi_init,),
        u0=u0, v0=v0, check_aux=("phis",))


def test_split_tier_rebasing_matches_xla():
    """Split tier with map rebasing: untriggered (analytic-rebuild cond
    branch) and always-triggered (phis0 sampling + FSM redistance under
    lax.cond) both equal the XLA path; the untriggered run is also
    bitwise-consistent with rebasing OFF (round-5 semantics: the bilinear
    phis0 sampling only starts at the first actual rebase event)."""
    import dataclasses

    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.sim import RMTConfig, make_init_state, make_step

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.55) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.02, rho_s=1.0, mu_f=0.01, rho_f=1.0,
                    num_layers=3, CFL=0.2, dt_min_cap=1e-3,
                    map_rebase_minj=1e-9)
    u0, v0 = _tg_u0(g)
    sx, _ = _assert_split_matches(cfg, (phi_init,), u0=u0, v0=v0,
                                  check_aux=("phis", "rebased"))

    # untriggered == rebasing-off, exactly (the analytic-rebuild branch)
    t_end = jnp.asarray(1.0, jnp.float64)
    cfg_off = dataclasses.replace(cfg, map_rebase_minj=0.0,
                                  rmt_method="xla")
    step_off = make_step(cfg_off, make_lid_bc(1.0), (phi_init,),
                         dtype=jnp.float64)
    s_off = make_init_state(cfg_off, (phi_init,), u0=u0, v0=v0,
                            dtype=jnp.float64)
    for _ in range(3):
        s_off, _ = step_off(s_off, t_end)
    assert np.allclose(np.asarray(sx.u), np.asarray(s_off.u), atol=0.0)
    assert np.allclose(np.asarray(sx.X1), np.asarray(s_off.X1), atol=0.0)

    # always-triggered: FSM redistance + identity reset every step
    cfg_t = dataclasses.replace(cfg, map_rebase_minj=10.0)
    _assert_split_matches(cfg_t, (phi_init,), u0=u0, v0=v0,
                          check_aux=("phis", "rebased"))


def test_split_tier_bicubic_area_fix_matches_xla():
    """Split tier with the band-guarded bicubic final gather + area fix."""
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.sim import RMTConfig

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.55) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.05, rho_s=1.0, mu_f=0.01, rho_f=1.0,
                    num_layers=3, CFL=0.2, dt_min_cap=1e-3,
                    phi_area_fix=True, sl_interp="bicubic")
    u0, v0 = _tg_u0(g)
    _assert_split_matches(cfg, (phi_init,), u0=u0, v0=v0,
                          check_aux=("phis", "J"))


def test_periodic_momentum_kernel_matches_xla_path():
    """Round-5: the fused RK4 momentum kernel's ('periodic',) spec (wrap
    stencils + overlap-identity row handling) equals the XLA periodic path
    (velocity_rhs_blended(periodic=True)) to roundoff, seam rows/cols
    included, for a solid clear of the seam."""
    import functools

    import pyrmt_tpu.kernels.momentum_rk4 as mk
    from pyrmt_tpu.bcs import periodic_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map
    from pyrmt_tpu.physics import momentum_step_rk4_multi

    N = 64
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    X, Y = g.coords(dtype=jnp.float64)

    def per(f):
        return f.at[-1, :].set(f[0, :]).at[:, -1].set(f[:, 0])

    u = per(0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y))
    v = per(-0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y))
    p = per(0.1 * jnp.cos(2 * jnp.pi * X) * jnp.cos(4 * jnp.pi * Y))
    phi = jnp.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2) - 0.2
    mask = (phi <= 0).astype(jnp.float64)
    X1e, X2e = extrapolate_reference_map(
        X * mask, Y * mask, phi, g.dx, g.dy, 3)
    kw = dict(mu_s=0.05, kappa=0.0, eta_s=0.01, dx=g.dx, dy=g.dy, dt=1e-3,
              rho_s=1.0, rho_f=1.0, mu_f=0.01, w_t=2 * g.dx, periodic=True)
    ux, vx, *_ = momentum_step_rk4_multi(
        u, v, p, X1e[None], X2e[None], phi[None], periodic_bc,
        use_pallas_rk4=False, **kw)
    orig = mk.momentum_rk4_pallas
    mk.momentum_rk4_pallas = functools.partial(orig, interpret=True)
    try:
        uk, vk, *_ = momentum_step_rk4_multi(
            u, v, p, X1e[None], X2e[None], phi[None], periodic_bc,
            use_pallas_rk4=True, **kw)
    finally:
        mk.momentum_rk4_pallas = orig
    assert np.allclose(np.asarray(ux), np.asarray(uk), atol=1e-13)
    assert np.allclose(np.asarray(vx), np.asarray(vk), atol=1e-13)
    # seam rows/cols exactly consistent
    assert float(jnp.max(jnp.abs(uk[-1] - uk[0]))) == 0.0
    assert float(jnp.max(jnp.abs(vk[:, -1] - vk[:, 0]))) < 1e-15


def test_periodic_solid_fused_step_matches_xla():
    """Round-5 (VERDICT r4 weak #4): a periodic solid config through the
    FUSED tier (RMT block + periodic momentum kernel) equals the XLA path —
    both bake the same edge-clamp gather semantics, and the seam guard
    keeps solids where clamp semantics are never exercised."""
    import dataclasses
    import functools

    import pyrmt_tpu.kernels.momentum_rk4 as mk
    import pyrmt_tpu.kernels.rmt_block as rb
    from pyrmt_tpu.bcs import periodic_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.sim import RMTConfig, make_init_state, make_step

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.02, mu_f=0.01, rho_s=1.0, rho_f=1.0,
                    bc_type="periodic", CFL=0.2, dt_min_cap=1e-3)
    X, Y = g.coords(dtype=jnp.float64)
    u0 = 0.2 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v0 = -0.2 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    state = make_init_state(cfg, (phi_init,), u0=u0, v0=v0,
                            dtype=jnp.float64)
    orig_rb = rb.rmt_block_fused
    orig_mk = mk.momentum_rk4_pallas
    rb.rmt_block_fused = functools.partial(orig_rb, interpret=True)
    mk.momentum_rk4_pallas = functools.partial(orig_mk, interpret=True)
    try:
        t_end = jnp.asarray(1.0, jnp.float64)
        step_x = make_step(dataclasses.replace(
            cfg, rmt_method="xla", momentum_method="xla"),
            periodic_bc, (phi_init,), dtype=jnp.float64)
        step_p = make_step(dataclasses.replace(
            cfg, rmt_method="pallas", momentum_method="pallas"),
            periodic_bc, (phi_init,), dtype=jnp.float64)
        sx, sp = state, state
        for _ in range(3):
            sx, _ = step_x(sx, t_end)
            sp, _ = step_p(sp, t_end)
        assert np.allclose(np.asarray(sx.u), np.asarray(sp.u), atol=1e-13)
        assert np.allclose(np.asarray(sx.v), np.asarray(sp.v), atol=1e-13)
        assert np.allclose(np.asarray(sx.p), np.asarray(sp.p), atol=1e-12)
        assert np.allclose(np.asarray(sx.X1), np.asarray(sp.X1), atol=1e-13)
    finally:
        rb.rmt_block_fused = orig_rb
        mk.momentum_rk4_pallas = orig_mk


def test_rmt_block_fused_traced_scalars_bitwise():
    """Round 5: mu_s/kappa/rho_s/rho_f are SMEM scalar OPERANDS of the
    fused RMT block (kernels/rmt_block.py _make_kernel docstring), not
    baked constants. Passing them as traced jnp scalars must reproduce the
    float-arg call BITWISE (same kernel, same values through the same SMEM
    slots), and evaluating the SAME compiled program at a different mu_s
    must equal a float-arg call at that mu_s."""
    import jax

    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.kernels.rmt_block import rmt_block_fused
    from pyrmt_tpu.sim import RMTConfig, make_init_state

    g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.6) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.1, kappa=0.5, rho_s=1.2, mu_f=0.01,
                    rho_f=1.0, num_layers=3)
    state = make_init_state(cfg, (phi_init,), dtype=jnp.float64)
    X, Y = g.coords(dtype=jnp.float64)
    u = 0.3 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v = -0.3 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    dt = 1e-3

    kw = dict(phi_inits=(phi_init,), dx=g.dx, dy=g.dy, num_layers=3,
              w_t=cfg.w_t, interpret=True)

    @jax.jit
    def call_traced(mu_s, kappa, rho_s, rho_f):
        return rmt_block_fused(u, v, state.X1, state.X2, dt,
                               mu_s=mu_s, kappa=kappa, rho_s=rho_s,
                               rho_f=rho_f, **kw)

    out_float = rmt_block_fused(u, v, state.X1, state.X2, dt,
                                mu_s=0.1, kappa=0.5, rho_s=1.2, rho_f=1.0,
                                **kw)
    args64 = [jnp.asarray(x, jnp.float64) for x in (0.1, 0.5, 1.2, 1.0)]
    out_traced = call_traced(*args64)
    for a, b in zip(out_float, out_traced):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # same compiled program, different parameter values
    out_float2 = rmt_block_fused(u, v, state.X1, state.X2, dt,
                                 mu_s=0.7, kappa=0.5, rho_s=1.2, rho_f=1.0,
                                 **kw)
    args64[0] = jnp.asarray(0.7, jnp.float64)
    out_traced2 = call_traced(*args64)
    for a, b in zip(out_float2, out_traced2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
