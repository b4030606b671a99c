"""Soft disc in a Taylor-Green vortex (Jain et al. 2019, Sec. 4.4).

Parity with the reference driver benchmarks/disc_in_taylor_green.py: a
neo-Hookean disc (R=0.2) in an imposed TG vortex on [0,1]^2; the flow
stretches the disc, elasticity retracts it; KE/SE/dissipation are tracked
over t in [0, 1] and the total-energy drift is reported.

Physics (Jain Sec. 4.4): mu_s(code)=1.0 (paper 0.5), mu_f=1e-3,
rho_s=rho_f=1, free-slip impermeable walls + Neumann pressure.

Usage:
    python benchmarks/disc_in_taylor_green.py [N] [scheme] [--f64]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(N=128, scheme="semilagrangian", t_end=1.0, out_root="outputs",
        stress_band=False, reinit_method="none", dtype="float32",
        log_every=50, verbose=True, cfg_overrides=None):
    import jax
    import jax.numpy as jnp

    from benchmarks.common import ensure_dir, make_disc_phi_init, taylor_green_velocity
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.diagnostics import (
        compute_kinetic_energy,
        compute_strain_energy,
        compute_viscous_dissipation,
    )
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.io import EnergyLogger
    from pyrmt_tpu.sim import RMTConfig, diverged, make_init_state, make_step

    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    phi_init = make_disc_phi_init(0.5, 0.5, 0.2)

    cfg = RMTConfig(
        grid=g, mu_s=1.0, kappa=0.0, rho_s=1.0, eta_s=0.0,
        mu_f=1.0e-3, rho_f=1.0, w_t_cells=2.0, scheme=scheme,
        bc_type="neumann", reinit_method=reinit_method,
        stress_band=stress_band, num_layers=3, CFL=0.2, dt_min_cap=1e-4,
    )
    if cfg_overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **cfg_overrides)
    step = make_step(cfg, free_slip_box_bc, (phi_init,), dtype=dt_)

    X, Y = g.coords(dtype=dt_)
    u0, v0 = taylor_green_velocity(np.asarray(X), np.asarray(Y), U0=0.05)
    u0, v0 = free_slip_box_bc(jnp.asarray(u0, dt_), jnp.asarray(v0, dt_))
    state = make_init_state(cfg, (phi_init,), u0=u0, v0=v0, dtype=dt_)
    t_end_j = jnp.asarray(t_end, dt_)

    @jax.jit
    def chunk(s):
        def body(carry, _):
            s, _, acc = carry
            s2, aux = step(s, t_end_j)
            diss = compute_viscous_dissipation(
                s2.u, s2.v, cfg.mu_f, aux["phis"][0], cfg.w_t, g.dx, g.dy,
                cfg.eta_s)
            return (s2, aux, acc + diss * aux["dt"]), None

        s1, aux1 = step(s, t_end_j)
        diss1 = compute_viscous_dissipation(
            s1.u, s1.v, cfg.mu_f, aux1["phis"][0], cfg.w_t, g.dx, g.dy, cfg.eta_s)
        (s2, aux, dint), _ = jax.lax.scan(
            body, (s1, aux1, diss1 * aux1["dt"]), None, length=log_every - 1)
        phi = aux["phis"][0]
        ke = compute_kinetic_energy(s2.u, s2.v, cfg.rho_f, cfg.rho_s, phi,
                                    cfg.w_t, g.dx, g.dy)
        se = compute_strain_energy(s2.X1[0], s2.X2[0], phi, cfg.mu_s,
                                   g.dx, g.dy, kappa=cfg.kappa)
        diss = compute_viscous_dissipation(s2.u, s2.v, cfg.mu_f, phi, cfg.w_t,
                                           g.dx, g.dy, cfg.eta_s)
        ys_mask = (phi <= 0)
        ys = jnp.where(ys_mask, Y, jnp.nan)
        ry = 0.5 * (jnp.nanmax(ys) - jnp.nanmin(ys))
        stats = jnp.stack([ke, se, diss, dint, ry, jnp.min(aux["J"]),
                           s2.t.astype(ke.dtype)])
        return s2, stats

    if verbose:
        print(f"[disc-in-TG] N={N} scheme={scheme} dtype={dtype}")
    log = EnergyLogger()
    integ = 0.0
    nsteps = 0
    t_wall = time.perf_counter()
    while float(state.t) < t_end:
        state, stats = chunk(state)
        nsteps += log_every
        ke, se, diss, dint, ry, minJ, t = map(float, np.asarray(stats))
        integ += dint
        row = dict(t=t, ke=ke, se=se, dissipation=diss,
                   integrated_dissipation=integ,
                   total_energy=ke + se + integ,
                   radius_y=ry, minJ=minJ)
        log.log(**row)
        if verbose:
            print(f"  step {nsteps:5d} t={t:5.3f} KE={row['ke']:.4e} "
                  f"SE={row['se']:.4e} E={row['total_energy']:.4e} "
                  f"ry={row['radius_y']:.3f} minJ={row['minJ']:.3f}")
        if bool(diverged(state)):
            print("  [diverged]")
            break
    wall = time.perf_counter() - t_wall

    out_dir = ensure_dir(os.path.join(out_root, f"disc_tg_N{N}_{scheme}"))
    log.to_csv(os.path.join(out_dir, "energy_history.csv"))
    rows = log.array("t", "ke", "se", "total_energy")
    drift = (rows[-1, 3] - rows[0, 3]) / max(abs(rows[0, 3]), 1e-30) * 100
    if verbose:
        print(f"[disc-in-TG] total energy drift: {drift:.2f}% over "
              f"t=[0,{t_end}]  ({nsteps} steps, {wall:.1f}s, "
              f"{nsteps / wall:.1f} steps/s)")
    return log.rows, drift


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()
    out_root = cli_out_root()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    scheme = sys.argv[2] if len(sys.argv) > 2 else "semilagrangian"
    dtype = "float64" if "--f64" in sys.argv else "float32"
    run(N=N, scheme=scheme, dtype=dtype, out_root=out_root)
