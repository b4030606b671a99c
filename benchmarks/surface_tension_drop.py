"""Surface-tension validation — Laplace's law for a static drop (CSF model).

Parity with the reference driver benchmarks/surface_tension_drop.py: a fixed
circular interface (analytic level set) with surface tension gamma must
develop Delta p = gamma/R and stay (nearly) static; residual parasitic
currents are the CSF quality metric.

The interface is HELD FIXED (no reference-map tracking), so the driver
bypasses the RMT stages: it calls the momentum step with a frozen phi and a
mu_s = 0 solid.

Usage:
    python benchmarks/surface_tension_drop.py [N] [gamma] [R]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(N=128, gamma=0.1, R=0.25, n_steps=2000, out_root="outputs",
        dtype="float32", log_every=200, verbose=True, st_method="csf",
        kappa_interface=False, curvature="fd", hf_smooth=0):
    """``st_method``: 'csf' (reference-parity cell-centred CSF) or
    'balanced' (face-sampled balanced-force CSF, physics.balanced_csf_forces);
    ``kappa_interface`` additionally projects curvature to its nearest-
    interface value (kappa/(1 - phi*kappa)). Measured at N=64 f64 (see
    benchmarks/README.md): balanced cuts steady-state parasitic Ca 2.3x and
    the first-step spurious currents 25x; +kappa_interface cuts the Laplace
    Delta-p error 6x on top."""
    import jax
    import jax.numpy as jnp

    from benchmarks.common import ensure_dir, initialize_disc
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.io import EnergyLogger
    from pyrmt_tpu.ops.levelset import compute_curvature
    from pyrmt_tpu.ops.poisson import precompute_poisson_eigenvalues
    from pyrmt_tpu.ops.projection import pressure_projection
    from pyrmt_tpu.ops.stress import smoothed_heaviside
    from pyrmt_tpu.physics import (
        balanced_csf_forces,
        momentum_step_rk4,
        momentum_step_rk4_multi,
    )

    if gamma <= 0.0:
        raise ValueError(
            "surface_tension_drop requires gamma > 0 (the capillary timestep "
            "limit dt ~ sqrt(rho dx^3 / (2 pi gamma)) is undefined at gamma=0)"
        )
    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    dx, dy = g.dx, g.dy
    X, Y = g.coords(dtype=dt_)
    phi = initialize_disc(X, Y, 0.5, 0.5, R).astype(dt_)
    X1, X2 = X, Y                       # identity map, mu_s = 0
    mu_f, rho_f = 0.01, 1.0
    rho_s = 1.0
    w_t = 2.0 * dx
    target = gamma / R
    eig = precompute_poisson_eigenvalues(N, N, dx, dy, dtype=dt_)

    dt_cap = 0.5 * np.sqrt(rho_f * dx**3 / (2.0 * np.pi * gamma))

    kap = compute_curvature(phi, dx, dy)
    band = np.abs(np.asarray(phi)) < w_t
    if verbose:
        print(f"[ST-drop] N={N} gamma={gamma} R={R} Laplace gamma/R="
              f"{target:.5f} curvature(band) mean="
              f"{float(np.asarray(kap)[band].mean()):.3f} (1/R={1 / R:.3f}) "
              f"dt={dt_cap:.2e}")

    H = smoothed_heaviside(phi, w_t)
    rho_local = (1 - H) * rho_s + H * rho_f

    if st_method == "balanced":
        H_stack = smoothed_heaviside(phi[None], w_t)
        fxc, fyc, Fxf, Fyf = balanced_csf_forces(
            phi[None], H_stack, dx, dy, gamma, kappa_interface=kappa_interface,
            curvature=curvature, w_t=w_t, hf_smooth=hf_smooth)
        st_faces = (Fxf, Fyf, fxc, fyc)

        @jax.jit
        def st_step(u, v, p):
            u_star, v_star, *_ = momentum_step_rk4_multi(
                u, v, p, X1[None], X2[None], phi[None], free_slip_box_bc,
                mu_s=0.0, kappa=0.0, eta_s=0.0, dx=dx, dy=dy, dt=dt_cap,
                rho_s=rho_s, rho_f=rho_f, mu_f=mu_f, w_t=w_t, gamma=gamma,
                ext_override=(fxc, fyc))
            return pressure_projection(
                u_star, v_star, dx, dy, dt_cap, rho_local, free_slip_box_bc,
                p_prev=p, eigenvalues=eig, bc_type="neumann",
                st_faces=st_faces)
    else:
        @jax.jit
        def st_step(u, v, p):
            u_star, v_star, *_ = momentum_step_rk4(
                u, v, p, X1, X2, free_slip_box_bc, 0.0, 0.0, 0.0, dx, dy,
                dt_cap, rho_s, rho_f, phi, mu_f, w_t, gamma=gamma)
            return pressure_projection(
                u_star, v_star, dx, dy, dt_cap, rho_local, free_slip_box_bc,
                p_prev=p, eigenvalues=eig, bc_type="neumann")

    @jax.jit
    def measure(u, v, p):
        inside = phi < -2.0 * w_t
        outside = phi > 2.0 * w_t
        n_in = jnp.sum(inside)
        n_out = jnp.sum(outside)
        dp = jnp.sum(jnp.where(inside, p, 0.0)) / n_in - jnp.sum(
            jnp.where(outside, p, 0.0)) / n_out
        return dp, jnp.max(jnp.hypot(u, v))

    u = jnp.zeros(g.shape, dt_)
    v = jnp.zeros(g.shape, dt_)
    p = jnp.zeros(g.shape, dt_)
    log = EnergyLogger()
    t_wall = time.perf_counter()
    for step_i in range(1, n_steps + 1):
        u, v, p = st_step(u, v, p)
        if step_i % log_every == 0 or step_i == 1 or step_i > n_steps - 50:
            dp, umax = measure(u, v, p)
            log.log(t=step_i * dt_cap, delta_p=float(dp), max_u=float(umax))
            if verbose and (step_i % log_every == 0 or step_i == 1):
                print(f"  step {step_i:5d} dp_in-out={float(dp):.5f} "
                      f"(target {target:.5f}) max spurious |u|={float(umax):.3e}")
    wall = time.perf_counter() - t_wall

    suffix = "" if st_method == "csf" else (
        "_balanced_kstar" if kappa_interface else "_balanced")
    if curvature != "fd":
        suffix += f"_{curvature}"
        if hf_smooth:
            suffix += f"s{hf_smooth}"
    out_dir = ensure_dir(
        os.path.join(out_root, f"surface_tension_drop_N{N}{suffix}"))
    log.to_csv(os.path.join(out_dir, "laplace_history.csv"))
    tail = log.array("t", "delta_p", "max_u")[-50:]
    dp_final = float(np.mean(tail[:, 1]))
    err = abs(dp_final - target) / target
    umax_last = float(tail[-1, 2])
    if verbose:
        print(f"[ST-drop] Delta_p={dp_final:.5f} | gamma/R={target:.5f} | "
              f"rel.err={err * 100:.2f}% | max spurious |u|={umax_last:.2e} "
              f"(Ca={umax_last * mu_f / gamma:.1e})  "
              f"({n_steps} steps, {wall:.1f}s)")
    return dp_final, target, err


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()  # consumes --cpu; --f64 sets jax_enable_x64
    out_root = cli_out_root()
    import jax

    st_method = "balanced" if "--balanced" in sys.argv else "csf"
    kappa_interface = "--kstar" in sys.argv
    hf_smooth = 2 if "--hf-smooth" in sys.argv else 0
    curvature = ("hf" if ("--hf" in sys.argv or hf_smooth) else "fd")
    argv = [a for a in sys.argv[1:]
            if a not in ("--f64", "--balanced", "--kstar", "--hf",
                         "--hf-smooth")]
    N = int(argv[0]) if len(argv) > 0 else 128
    gamma = float(argv[1]) if len(argv) > 1 else 0.1
    R = float(argv[2]) if len(argv) > 2 else 0.25
    dtype = "float64" if jax.config.jax_enable_x64 else "float32"
    run(N=N, gamma=gamma, R=R, dtype=dtype, st_method=st_method,
        kappa_interface=kappa_interface, curvature=curvature,
        hf_smooth=hf_smooth, out_root=out_root)
