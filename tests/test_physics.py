"""Momentum step + timestep: smoke and consistency checks."""
import numpy as np

import jax.numpy as jnp

from pyrmt_tpu.grid import create_grid
from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map
from pyrmt_tpu.ops.levelset import apply_phi_BCs
from pyrmt_tpu.physics import (
    compute_timestep,
    momentum_step_rk4,
    momentum_step_rk4_2solids,
)


def _disc(X, Y, x0, y0, R):
    return np.sqrt((X - x0) ** 2 + (Y - y0) ** 2) - R


def test_timestep_limits():
    N = 65
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    a = jnp.ones((N, N))
    b = jnp.zeros((N, N))
    # pure fluid advection limit: CFL*dx/(|u|+1e-6)
    dt = float(compute_timestep(a, b, dx, dy, 0.2, 1.0, 0.0, 0.0, 0.0, 1.0))
    assert abs(dt - 0.2 * dx / (1.0 + 1e-6)) < 1e-12
    # solid wave-speed limit dominates for stiff solid at rest
    dt2 = float(
        compute_timestep(0 * a, b, dx, dy, 0.2, 1.0, 100.0, 1.0, 0.0, 1.0)
    )
    cs = np.sqrt(100.0 * 4.0 / 3.0)
    assert abs(dt2 - 0.2 * dx / (cs + 1e-14)) < 1e-12
    # viscous limit
    dt3 = float(
        compute_timestep(0 * a, b, dx, dy, 0.2, 1.0, 0.0, 1.0, 0.0, 1.0, mu_f=1.0)
    )
    assert abs(dt3 - 0.2 * dx**2 / 4.0) < 1e-12


def _free_slip(u, v):
    u = u.at[:, 0].set(0.0).at[:, -1].set(0.0)
    v = v.at[:, 0].set(v[:, 1]).at[:, -1].set(v[:, -2])
    v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
    u = u.at[0, :].set(u[1, :]).at[-1, :].set(u[-2, :])
    return u, v


def test_undeformed_solid_at_rest_stays_at_rest():
    """Identity reference map + zero velocity: sigma = mu*I is constant, so
    div(blended sigma) is ~0 away from the interface and the momentum step
    produces only small interface-localised velocities."""
    N = 65
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    Xn, Yn = np.asarray(X), np.asarray(Y)
    phi = _disc(Xn, Yn, 0.5, 0.5, 0.2)
    solid = (phi < 0).astype(float)
    X1, X2 = extrapolate_reference_map(Xn * solid, Yn * solid, phi, dx, dy, 3)
    u = jnp.zeros((N, N))
    v = jnp.zeros((N, N))
    p = jnp.zeros((N, N))
    dt = 1e-4
    un, vn, sxx, sxy, syy, J = momentum_step_rk4(
        u, v, p, X1, X2, _free_slip, 1.0, 0.0, 0.0, dx, dy, dt,
        1.0, 1.0, jnp.asarray(phi), 1e-3, 2 * dx)
    un, vn, J = map(np.asarray, (un, vn, J))
    assert np.all(np.isfinite(un)) and np.all(np.isfinite(vn))
    assert np.allclose(J[phi <= 0], 1.0, atol=1e-5)
    # interface force from the smoothed blend is the only residual
    far = np.abs(phi) > 4 * dx
    assert np.max(np.abs(un[far])) < 1e-6
    assert np.max(np.abs(vn[far])) < 1e-6


def test_two_solid_momentum_step_runs():
    """Two-solid step (blended stress + contact force) returns finite fields
    (same contract as the reference's tests/test_contact.py:44-64)."""
    N = 48
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    Xn, Yn = np.asarray(X), np.asarray(Y)
    R = 0.15
    pa = np.asarray(apply_phi_BCs(jnp.asarray(_disc(Xn, Yn, 0.35, 0.5, R))))
    pb = np.asarray(apply_phi_BCs(jnp.asarray(_disc(Xn, Yn, 0.65, 0.5, R))))
    ma = (pa <= 0).astype(float)
    mb = (pb <= 0).astype(float)
    X1a, X2a = extrapolate_reference_map(Xn * ma, Yn * ma, pa, dx, dy, 3)
    X1b, X2b = extrapolate_reference_map(Xn * mb, Yn * mb, pb, dx, dy, 3)
    bc = lambda u, v: (u, v)
    u = jnp.zeros((N, N))
    v = jnp.zeros((N, N))
    p = jnp.zeros((N, N))
    un, vn, Jmin = momentum_step_rk4_2solids(
        u, v, p, X1a, X2a, X1b, X2b, bc, 1.0, 0.0, 0.0, dx, dy, 1e-3, 1.0, 1.0,
        jnp.asarray(pa), jnp.asarray(pb), 0.01, 2 * dx, k_rep=2.0, w_c=3 * dx)
    assert np.all(np.isfinite(np.asarray(un)))
    assert np.all(np.isfinite(np.asarray(vn)))
    assert np.all(np.isfinite(np.asarray(Jmin)))


def test_kelvin_voigt_damps_shear():
    """With eta_s > 0 a shearing solid produces different (damped) stage
    dynamics than eta_s = 0."""
    N = 49
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    Xn, Yn = np.asarray(X), np.asarray(Y)
    phi = _disc(Xn, Yn, 0.5, 0.5, 0.25)
    solid = (phi < 0).astype(float)
    X1, X2 = extrapolate_reference_map(Xn * solid, Yn * solid, phi, dx, dy, 3)
    u = jnp.asarray(0.1 * np.sin(np.pi * Yn))
    v = jnp.zeros((N, N))
    p = jnp.zeros((N, N))
    args = (u, v, p, X1, X2, lambda a, b: (a, b), 1.0, 0.0)
    kw = dict(dx=dx, dy=dy, dt=1e-3, rho_s=1.0, rho_f=1.0,
              phi=jnp.asarray(phi), mu_f=1e-3, w_t=2 * dx)
    u0, v0, *_ = momentum_step_rk4(*args, 0.0, kw["dx"], kw["dy"], kw["dt"],
                                   kw["rho_s"], kw["rho_f"], kw["phi"],
                                   kw["mu_f"], kw["w_t"])
    u1, v1, *_ = momentum_step_rk4(*args, 0.05, kw["dx"], kw["dy"], kw["dt"],
                                   kw["rho_s"], kw["rho_f"], kw["phi"],
                                   kw["mu_f"], kw["w_t"])
    assert not np.allclose(np.asarray(u0), np.asarray(u1))


def test_three_solid_momentum_step_generalizes():
    """The n-solid mixture is generic: three discs produce finite fields and
    the mixture density reduces correctly (Hf = sum H_i - (S-1))."""
    import jax
    import jax.numpy as jnp

    from pyrmt_tpu.ops.stress import smoothed_heaviside
    from pyrmt_tpu.physics import momentum_step_rk4_multi

    N = 48
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    Xn, Yn = np.asarray(X), np.asarray(Y)
    centers = [(0.3, 0.3), (0.7, 0.3), (0.5, 0.7)]
    R = 0.12
    phis, X1s, X2s = [], [], []
    for (cx, cy) in centers:
        ph = _disc(Xn, Yn, cx, cy, R)
        m = (ph <= 0).astype(float)
        x1, x2 = extrapolate_reference_map(Xn * m, Yn * m, ph, dx, dy, 3)
        phis.append(ph); X1s.append(np.asarray(x1)); X2s.append(np.asarray(x2))
    phis, X1s, X2s = map(lambda a: jnp.asarray(np.stack(a)), (phis, X1s, X2s))
    u = jnp.zeros((N, N)); v = jnp.zeros((N, N)); p = jnp.zeros((N, N))
    un, vn, sxx, sxy, syy, J = momentum_step_rk4_multi(
        u, v, p, X1s, X2s, phis, lambda a, b: (a, b),
        mu_s=1.0, kappa=0.0, eta_s=0.0, dx=dx, dy=dy, dt=1e-3,
        rho_s=2.0, rho_f=1.0, mu_f=0.01, w_t=2 * dx,
        stress_clamp=4.0, k_rep=2.0, w_c=3 * dx)
    assert np.all(np.isfinite(np.asarray(un)))
    assert np.all(np.isfinite(np.asarray(vn)))
    assert J.shape[0] == 3
    # mixture density: rho_f far from all solids, rho_s inside a solid
    H = smoothed_heaviside(phis, 2 * dx)
    Hf = jnp.sum(H, axis=0) - 2.0
    rho = Hf * 1.0 + jnp.sum(1.0 - H, axis=0) * 2.0
    rho = np.asarray(rho)
    far = np.all(np.asarray(phis) > 4 * dx, axis=0)
    assert np.allclose(rho[far], 1.0, atol=1e-12)
    inside0 = np.asarray(phis[0]) < -4 * dx
    assert np.allclose(rho[inside0], 2.0, atol=1e-12)


def test_balanced_csf_exact_discrete_equilibrium():
    """The balanced-force property (physics.balanced_csf_forces docstring):
    for a FACE-CONSTANT curvature the discrete equilibrium
    p* = -gamma*kappa*H (+ const), u = 0 is an EXACT fixed point of the
    full momentum + Rhie-Chow projection step — the face pressure jump
    cancels the face capillary force identically, so the velocity stays at
    machine zero and the pressure is unchanged. The cell-centred CSF has no
    such equilibrium (its wide-stencil force is not a discrete face
    gradient): the same one-step experiment from its best-fit pressure
    leaves O(1e-4) spurious currents."""
    import jax.numpy as jnp

    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.ops.poisson import precompute_poisson_eigenvalues
    from pyrmt_tpu.ops.projection import pressure_projection
    from pyrmt_tpu.ops.stress import smoothed_heaviside
    from pyrmt_tpu.physics import balanced_csf_forces, momentum_step_rk4_multi

    N, gamma, R = 64, 0.1, 0.25
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    phi = jnp.asarray(_disc(np.asarray(X), np.asarray(Y), 0.5, 0.5, R))
    phis = phi[None]
    w_t = 2.0 * dx
    H_s = smoothed_heaviside(phis, w_t)
    kap0 = 1.0 / R
    kap_const = jnp.full((1, N, N), kap0)      # face-constant curvature
    fxc, fyc, Fxf, Fyf = balanced_csf_forces(
        phis, H_s, dx, dy, gamma, kappas=kap_const)
    eig = precompute_poisson_eigenvalues(N, N, dx, dy)
    rho_local = jnp.ones((N, N), jnp.float64)
    # the exact discrete equilibrium: (p_E - p_C)/dx == Fx_face on every face
    p_eq = -gamma * kap0 * H_s[0]
    p_eq = p_eq - jnp.mean(p_eq)
    u = jnp.zeros((N, N), jnp.float64)
    v = jnp.zeros_like(u)
    dt = 1e-3
    u_star, v_star, *_ = momentum_step_rk4_multi(
        u, v, p_eq, X[None], Y[None], phis, free_slip_box_bc,
        mu_s=0.0, kappa=0.0, eta_s=0.0, dx=dx, dy=dy, dt=dt,
        rho_s=1.0, rho_f=1.0, mu_f=0.01, w_t=w_t, gamma=gamma,
        ext_override=(fxc, fyc))
    assert float(jnp.max(jnp.abs(u_star))) < 1e-13   # momentum is balanced
    assert float(jnp.max(jnp.abs(v_star))) < 1e-13
    un, vn, pn = pressure_projection(
        u_star, v_star, dx, dy, dt, rho_local, free_slip_box_bc,
        p_prev=p_eq, eigenvalues=eig, bc_type="neumann",
        st_faces=(Fxf, Fyf, fxc, fyc))
    umax = float(jnp.max(jnp.hypot(un, vn)))
    assert umax < 1e-12, umax                        # RC corrector too
    assert float(jnp.max(jnp.abs(pn - p_eq))) < 1e-11
    # and the equilibrium pressure jump is the Laplace value gamma/R
    inside = np.asarray(phi) < -2 * w_t
    outside = np.asarray(phi) > 2 * w_t
    dp = float(np.asarray(pn)[inside].mean() - np.asarray(pn)[outside].mean())
    assert abs(dp - gamma / R) / (gamma / R) < 1e-12


def test_kappa_interface_projection_exact_for_circle():
    """kappa_interface=True projects the band curvature 1/(R+phi) to the
    interface value 1/R (exact for an SDF circle): the face curvature used
    in the force must collapse to ~1/R across the whole band."""
    import jax.numpy as jnp

    from pyrmt_tpu.ops.levelset import compute_curvature
    from pyrmt_tpu.ops.stress import smoothed_heaviside
    from pyrmt_tpu.physics import balanced_csf_forces

    N, R = 96, 0.25
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    phi = jnp.asarray(_disc(np.asarray(X), np.asarray(Y), 0.5, 0.5, R))
    w_t = 2.0 * dx
    H_s = smoothed_heaviside(phi[None], w_t)
    gamma = 0.1
    # recover the effective curvature from the force: F = -gamma*k_f*dH/dx
    _, _, Fx_raw, _ = balanced_csf_forces(phi[None], H_s, dx, dy, gamma)
    _, _, Fx_star, _ = balanced_csf_forces(phi[None], H_s, dx, dy, gamma,
                                           kappa_interface=True)
    dH = (H_s[0][:, 1:] - H_s[0][:, :-1]) / dx
    m = np.abs(np.asarray(dH)) > 1.0     # active faces
    k_raw = -np.asarray(Fx_raw)[m] / (gamma * np.asarray(dH)[m])
    k_star = -np.asarray(Fx_star)[m] / (gamma * np.asarray(dH)[m])
    # raw curvature spans the band spread ~ w_t/R^2; projected collapses
    assert np.ptp(k_star) < 0.25 * np.ptp(k_raw)
    assert abs(np.mean(k_star) - 1.0 / R) < abs(np.mean(k_raw) - 1.0 / R)
    assert abs(np.mean(k_star) - 1.0 / R) < 0.05 / R
