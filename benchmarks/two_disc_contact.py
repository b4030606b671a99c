"""Two soft discs colliding head-on — solid-solid contact (Jain Sec. 3.6/4.6).

Parity with the reference driver benchmarks/two_disc_contact.py: two
neo-Hookean discs with approaching velocities; the short-range repulsion
prevents inter-penetration and they rebound. Diagnostic: centre gap
decreases, reaches a positive minimum (no pass-through), then increases.

Usage:
    python benchmarks/two_disc_contact.py [N] [t_end] [V0] [k_rep]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(N=128, t_end=2.0, V0=0.15, k_rep=2.0, out_root="outputs",
        dtype="float32", log_every=50, verbose=True, cfg_overrides=None):
    import jax
    import jax.numpy as jnp

    from benchmarks.common import ensure_dir, make_disc_phi_init
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.diagnostics import disc_centroid
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.io import EnergyLogger
    from pyrmt_tpu.ops.stress import smoothed_heaviside
    from pyrmt_tpu.sim import RMTConfig, diverged, make_init_state, make_step

    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    R = 0.15
    pia = make_disc_phi_init(0.30, 0.50, R)
    pib = make_disc_phi_init(0.70, 0.50, R)

    cfg = RMTConfig(
        grid=g, mu_s=1.0, kappa=0.0, rho_s=1.0, eta_s=0.0,
        mu_f=0.01, rho_f=1.0, w_t_cells=2.0, w_c_cells=3.0, k_rep=k_rep,
        two_solid_clamp=4.0, num_layers=3, CFL=0.2, dt_min_cap=1e-3,
    )
    if cfg_overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **cfg_overrides)
    step = make_step(cfg, free_slip_box_bc, (pia, pib), dtype=dt_)

    X, Y = g.coords(dtype=dt_)
    Ha = smoothed_heaviside(pia(X, Y), cfg.w_t)
    Hb = smoothed_heaviside(pib(X, Y), cfg.w_t)
    u0 = V0 * (1 - Ha) - V0 * (1 - Hb)
    v0 = jnp.zeros(g.shape, dt_)
    u0, v0 = free_slip_box_bc(u0.astype(dt_), v0)
    state = make_init_state(cfg, (pia, pib), u0=u0, v0=v0, dtype=dt_)
    t_end_j = jnp.asarray(t_end, dt_)

    @jax.jit
    def chunk(s):
        # running min over EVERY step of the chunk (the reference logs
        # min(Ja, Jb) per step, two_disc_contact.py:104 — a chunk-boundary
        # sample would understate the peak compression)
        def body(carry, _):
            s, _, jm = carry
            s2, aux = step(s, t_end_j)
            return (s2, aux, jnp.minimum(jm, jnp.min(aux["J"]))), None

        s1, aux1 = step(s, t_end_j)
        (s2, aux, jmin), _ = jax.lax.scan(
            body, (s1, aux1, jnp.min(aux1["J"])), None, length=log_every - 1)
        cxa, cya = disc_centroid(aux["phis"][0], X, Y)
        cxb, cyb = disc_centroid(aux["phis"][1], X, Y)
        umax = jnp.max(jnp.hypot(s2.u, s2.v))
        stats = jnp.stack([cxa, cxb, jmin.astype(umax.dtype), umax,
                           s2.t.astype(umax.dtype)])
        return s2, stats

    if verbose:
        print(f"[contact] N={N} R={R} V0={V0} k_rep={k_rep} t_end={t_end}")
    log = EnergyLogger()
    t_wall = time.perf_counter()
    nsteps = 0
    while float(state.t) < t_end:
        state, stats = chunk(state)
        nsteps += log_every
        cxa, cxb, Jmin, umax, t = map(float, np.asarray(stats))
        gap = cxb - cxa
        log.log(t=t, cxa=cxa, cxb=cxb, gap=gap, minJ=Jmin)
        if verbose:
            print(f"  step {nsteps:5d} t={t:5.3f} cxa={cxa:.3f} "
                  f"cxb={cxb:.3f} gap={gap:.3f} minJ={Jmin:.3f} "
                  f"max|u|={umax:.3f}")
        if bool(diverged(state)):
            print("  [diverged]")
            break
    wall = time.perf_counter() - t_wall

    out_dir = ensure_dir(os.path.join(out_root, f"two_disc_contact_N{N}"))
    log.to_csv(os.path.join(out_dir, "centroids.csv"))
    hist = log.array("t", "cxa", "cxb", "gap", "minJ")
    gmin = float(hist[:, 3].min())
    jmin = float(hist[:, 4].min())
    approached = int(hist[:, 3].argmin()) < len(hist) - 1
    rebounded = hist[-1, 3] > gmin + 1e-3
    if verbose:
        print(f"[contact] min center gap = {gmin:.3f} (2R={2 * R:.3f}); "
              f"min J = {jmin:.3f} (peak elastic compression; upstream code "
              f"measures 0.6725 at N=64 — see benchmarks/upstream_rerun/); "
              f"{'REBOUND' if (approached and rebounded) else 'no clear rebound'}; "
              f"no pass-through: {gmin > 0}  "
              f"({nsteps} steps, {wall:.1f}s, {nsteps / wall:.1f} steps/s)")
    return hist, gmin, (approached and rebounded)


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()
    out_root = cli_out_root()
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    V0 = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    k_rep = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    run(N=N, t_end=t_end, V0=V0, k_rep=k_rep, out_root=out_root)
