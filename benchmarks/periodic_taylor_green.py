"""Periodic Taylor-Green decaying vortex — END-TO-END validation of the
doubly-periodic stack against a physical answer.

The reference SHIPS a periodic Poisson/projection branch
(pyRMT/functions.py:1092-1211: FFT solve on the reduced sub-grid, periodic
wide-central divergence/gradient, null modes pinned) but has NO driver, no
benchmark, and no validation for it; its own benchmarks note explicitly
avoids periodic BCs (reference benchmarks/common.py:14-18). This driver
closes that gap — and the bar is beat, not match: the reference's momentum
stencils stay ONE-SIDED at the boundary ring even under bc_type='periodic'
(pyRMT/utils.py closures feed velocity_rhs unconditionally), which is
measured UNCONDITIONALLY UNSTABLE on this exact case (pressure feedback at
the ring; upstream's own code blows up at t≈0.06 —
`benchmarks/upstream_rerun/run_periodic_tg.py`). This framework swaps in
periodic-wrap momentum stencils when bc_type='periodic'
(ops/fd.py periodic variants; documented deviation docs/DESIGN.md #10).

Physics: on the doubly-periodic unit box the Taylor-Green vortex

    u =  U0 sin(2 pi x) cos(2 pi y) exp(-8 pi^2 nu t)
    v = -U0 cos(2 pi x) sin(2 pi y) exp(-8 pi^2 nu t)

is an EXACT Navier-Stokes solution (the nonlinear term is balanced by the
gradient of p = (rho U0^2/4)(cos 4 pi x + cos 4 pi y) e^{-16 pi^2 nu t}),
so the kinetic energy must decay at exactly 16 pi^2 nu. Validated:

  * KE decay-rate relative error (the headline gate),
  * final velocity-field profile error vs the analytic solution,
  * interior divergence stays at solver tolerance.

``--solid`` additionally runs the FULL RMT pipeline under periodic BCs: a
neutrally-buoyant near-fluid disc parked at the vortex centre (0.25, 0.25)
spins in place — its centroid must stay sub-cell while the vortex decays
(the solid must not touch the domain boundary: the reference-map machinery
clamps, not wraps).

Usage:
    python benchmarks/periodic_taylor_green.py [N] [--solid] [--cpu] [--f64]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(N=129, nu=0.01, U0=0.5, t_end=0.5, with_solid=False,
        out_root="outputs", dtype="float32", log_every=100, verbose=True):
    import jax
    import jax.numpy as jnp

    from benchmarks.common import ensure_dir
    from pyrmt_tpu.bcs import periodic_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.io import EnergyLogger
    from pyrmt_tpu.ops.poisson import compute_divergence_periodic
    from pyrmt_tpu.ops.stress import smoothed_heaviside
    from pyrmt_tpu.sim import RMTConfig, diverged, make_init_state, make_step

    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    phi_inits = ()
    if with_solid:
        def phi_init(Xq, Yq):
            return jnp.sqrt((Xq - 0.25) ** 2 + (Yq - 0.25) ** 2) - 0.1

        phi_inits = (phi_init,)
    cfg = RMTConfig(
        grid=g, mu_s=1e-3 if with_solid else 0.0, rho_s=1.0,
        mu_f=nu, rho_f=1.0, bc_type="periodic",
        scheme="semilagrangian", num_layers=3, CFL=0.3, dt_min_cap=1e-3,
    )
    X, Y = g.coords(dtype=dt_)
    u0 = U0 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
    v0 = -U0 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    step = make_step(cfg, periodic_bc, phi_inits, dtype=dt_)
    state = make_init_state(cfg, phi_inits, u0=u0, v0=v0, dtype=dt_)
    t_end_j = jnp.asarray(t_end, dt_)
    rate_exact = 16.0 * np.pi**2 * nu

    @jax.jit
    def chunk(s):
        def body(carry, _):
            s, _aux = carry
            s2, aux = step(s, t_end_j)
            return (s2, aux), None

        s1, aux1 = step(s, t_end_j)
        (s2, aux), _ = jax.lax.scan(body, (s1, aux1), None,
                                    length=log_every - 1)
        ke = 0.5 * jnp.sum(s2.u**2 + s2.v**2) * g.dx * g.dy
        div = compute_divergence_periodic(s2.u, s2.v, g.dx, g.dy)
        ty = s2.t.dtype
        stats = [s2.t, ke.astype(ty), jnp.max(jnp.abs(div)).astype(ty)]
        if with_solid:
            w = 1.0 - smoothed_heaviside(aux["phis"][0], cfg.w_t)
            wsum = jnp.sum(w)
            stats += [(jnp.sum(w * X) / wsum).astype(ty),
                      (jnp.sum(w * Y) / wsum).astype(ty)]
        return s2, jnp.stack(stats)

    if verbose:
        print(f"[periodic-TG] N={N} nu={nu} U0={U0} t_end={t_end} "
              f"solid={with_solid} analytic KE rate={rate_exact:.4f}")
    log = EnergyLogger()
    nsteps = 0
    t_wall = time.perf_counter()
    while float(state.t) < t_end:
        state, stats = chunk(state)
        nsteps += log_every
        vals = list(map(float, np.asarray(stats)))
        row = dict(t=vals[0], ke=vals[1], maxdiv=vals[2])
        if with_solid:
            row.update(xc=vals[3], yc=vals[4])
        log.log(**row)
        if verbose and nsteps % (5 * log_every) == 0:
            print(f"  step {nsteps:6d} t={vals[0]:.3f} KE={vals[1]:.5e} "
                  f"max|div|={vals[2]:.2e}")
        if bool(diverged(state)):
            print("  [diverged]")
            break
    wall = time.perf_counter() - t_wall

    tag = "_solid" if with_solid else ""
    out_dir = ensure_dir(os.path.join(out_root, f"periodic_tg_N{N}{tag}"))
    log.to_csv(os.path.join(out_dir, "decay.csv"))

    rows = log.array("t", "ke", "maxdiv")
    blew_up = bool(diverged(state))
    rate = float(np.polyfit(rows[:, 0], np.log(rows[:, 1]), 1)[0])
    rate_err = abs(rate + rate_exact) / rate_exact
    # final-field profile error vs the exact solution
    t_f = float(state.t)
    ua = (U0 * np.sin(2 * np.pi * np.asarray(X))
          * np.cos(2 * np.pi * np.asarray(Y)) * np.exp(-8 * np.pi**2 * nu * t_f))
    prof_err = float(np.max(np.abs(np.asarray(state.u) - ua))
                     / (U0 * np.exp(-8 * np.pi**2 * nu * t_f)))
    summary = dict(
        stable=not blew_up, rate=rate, rate_exact=-rate_exact,
        rate_rel_err=rate_err, profile_rel_err=prof_err,
        maxdiv=float(np.max(rows[:, 2])), steps=nsteps, wall_s=wall,
    )
    if with_solid:
        cen = log.array("xc", "yc")
        drift = float(np.max(np.hypot(cen[:, 0] - cen[0, 0],
                                      cen[:, 1] - cen[0, 1])))
        summary["centroid_drift"] = drift
        summary["centroid_drift_cells"] = drift / g.dx
    if verbose:
        print(f"[periodic-TG] stable={summary['stable']}  KE rate {rate:.4f} "
              f"vs analytic {-rate_exact:.4f} (rel err {rate_err*100:.2f}%)")
        print(f"  final profile rel err {prof_err:.2e}  max|div| "
              f"{summary['maxdiv']:.2e}  ({nsteps} steps, {wall:.1f}s)")
        if with_solid:
            print(f"  vortex-centre disc centroid drift "
                  f"{summary['centroid_drift_cells']:.2f} cells")
    return log.rows, summary


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()
    out_root = cli_out_root()
    import jax

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(argv[0]) if len(argv) > 0 else 129
    dtype = "float64" if jax.config.jax_enable_x64 else "float32"
    run(N=N, with_solid="--solid" in sys.argv, dtype=dtype,
        out_root=out_root)
