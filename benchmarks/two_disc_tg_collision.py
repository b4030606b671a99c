"""Two soft discs colliding in a Taylor-Green vortex (Jain 2019 Sec. 4.6).

Parity with the reference driver benchmarks/two_disc_tg_collision.py: two
discs above/below the centre are driven together by an imposed TG vortex;
repulsive contact prevents pass-through and they rebound. Equal densities ->
constant-density DCT projection. Divergence is reported gracefully via the
``diverged`` predicate.

Usage:
    python benchmarks/two_disc_tg_collision.py [N] [t_end] [U0] [k_rep]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(N=128, t_end=2.0, U0=0.12, k_rep=3.0, out_root="outputs",
        dtype="float32", log_every=50, verbose=True, cfg_overrides=None):
    import jax
    import jax.numpy as jnp

    from benchmarks.common import ensure_dir, make_disc_phi_init, taylor_green_velocity
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.diagnostics import disc_centroid
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.io import EnergyLogger
    from pyrmt_tpu.sim import RMTConfig, diverged, make_init_state, make_step

    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    R = 0.12
    pia = make_disc_phi_init(0.5, 0.35, R)
    pib = make_disc_phi_init(0.5, 0.65, R)

    cfg = RMTConfig(
        grid=g, mu_s=0.5, kappa=0.0, rho_s=1.0, eta_s=0.0,
        mu_f=0.02, rho_f=1.0, w_t_cells=2.0, w_c_cells=2.0, k_rep=k_rep,
        two_solid_clamp=4.0, num_layers=3, CFL=0.2, dt_min_cap=1e-3,
    )
    if cfg_overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **cfg_overrides)
    step = make_step(cfg, free_slip_box_bc, (pia, pib), dtype=dt_)

    X, Y = g.coords(dtype=dt_)
    u0, v0 = taylor_green_velocity(np.asarray(X), np.asarray(Y), U0=U0)
    u0, v0 = free_slip_box_bc(jnp.asarray(u0, dt_), jnp.asarray(v0, dt_))
    state = make_init_state(cfg, (pia, pib), u0=u0, v0=v0, dtype=dt_)
    t_end_j = jnp.asarray(t_end, dt_)

    @jax.jit
    def chunk(s):
        def body(carry, _):
            s, _ = carry
            s2, aux = step(s, t_end_j)
            return (s2, aux), None

        s1, aux1 = step(s, t_end_j)
        (s2, aux), _ = jax.lax.scan(body, (s1, aux1), None, length=log_every - 1)
        cxa, cya = disc_centroid(aux["phis"][0], X, Y)
        cxb, cyb = disc_centroid(aux["phis"][1], X, Y)
        umax = jnp.max(jnp.hypot(s2.u, s2.v))
        stats = jnp.stack([cya, cyb, jnp.min(aux["J"]), umax,
                           s2.t.astype(umax.dtype)])
        return s2, stats

    if verbose:
        print(f"[tg-contact] N={N} R={R} U0={U0} k_rep={k_rep} t_end={t_end}")
    log = EnergyLogger()
    t_wall = time.perf_counter()
    nsteps = 0
    was_diverged = False
    while float(state.t) < t_end:
        state, stats = chunk(state)
        nsteps += log_every
        cya, cyb, Jmin, umax, t = map(float, np.asarray(stats))
        gap = cyb - cya
        log.log(t=t, cya=cya, cyb=cyb, gap=gap, minJ=Jmin)
        if verbose:
            print(f"  step {nsteps:5d} t={t:5.3f} cya={cya:.3f} "
                  f"cyb={cyb:.3f} gap={gap:.3f} minJ={Jmin:.3f} "
                  f"max|u|={umax:.3f}")
        if bool(diverged(state)):
            print(f"  [diverged at step {nsteps}, t={t:.3f}] (graceful)")
            was_diverged = True
            break
    wall = time.perf_counter() - t_wall

    out_dir = ensure_dir(os.path.join(out_root, f"two_disc_tg_N{N}"))
    log.to_csv(os.path.join(out_dir, "centroids.csv"))
    hist = log.array("t", "cya", "cyb", "gap", "minJ")
    gmin = float(hist[:, 3].min())
    imin = int(hist[:, 3].argmin())
    rebound = (imin < len(hist) - 1) and (hist[-1, 3] > gmin + 5e-3)
    if verbose:
        print(f"[tg-contact] {'DIVERGED (graceful)' if was_diverged else 'completed'}; "
              f"min vertical gap = {gmin:.3f} (2R={2 * R:.3f}); "
              f"no pass-through: {gmin > 0}; rebound: {rebound}  "
              f"({nsteps} steps, {wall:.1f}s, {nsteps / wall:.1f} steps/s)")
    return hist, gmin, rebound, was_diverged


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()
    out_root = cli_out_root()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    U0 = float(sys.argv[3]) if len(sys.argv) > 3 else 0.12
    k_rep = float(sys.argv[4]) if len(sys.argv) > 4 else 3.0
    run(N=N, t_end=t_end, U0=U0, k_rep=k_rep, out_root=out_root)
