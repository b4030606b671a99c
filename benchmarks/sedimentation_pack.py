"""Many-solid sedimentation: S heavy discs settling under buoyancy.

Beyond-reference scaling demo for the n-solid machinery (the reference
hard-codes 1- and 2-solid drivers; this framework's momentum/mixture/
contact path is generic over S — vmapped stress, sum-blends, all S(S-1)/2
contact pairs): a staggered pack of heavy discs is released at rest in a
closed box under gravity and settles through the variable-density CG
projection with pairwise repulsive contact keeping the pack impenetrable.

Validation (quantitative, per run):
  * NO pass-through: the minimum centre-to-centre distance over every pair
    and every logged step stays above 2R - w_c (contact may compress the
    smoothed shells by up to the bump half-width, never through);
  * settling: the pack's mean height decreases monotonically and the
    kinetic energy after the settling transient decays;
  * mass conservation: every disc's area drift stays at interface level;
  * solver health: CG iterations bounded (in-graph aux['cg_iters']).

Usage:
    python benchmarks/sedimentation_pack.py [N] [S] [--f64] [--cpu]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pack_positions(S, R):
    """Staggered rows across the upper half of the unit box."""
    per_row = max(2, int(np.ceil(np.sqrt(S))))
    rows = int(np.ceil(S / per_row))
    pos = []
    for k in range(S):
        r, c = divmod(k, per_row)
        x = (c + 1) / (per_row + 1) + (0.5 * R if r % 2 else -0.5 * R)
        y = 0.82 - r * (2.6 * R)
        pos.append((x, y))
    return pos


def run(N=256, S=10, R=0.06, rho_ratio=2.0, t_end=2.0, g0=1.0,
        out_root="outputs", dtype="float32", log_every=50, verbose=True,
        cfg_overrides=None, resume=False, ckpt_every=10, max_chunks=None):
    """``resume=True`` continues from ``<out_dir>/checkpoint.npz`` (written
    every ``ckpt_every`` chunks) and re-extends the logged history — the
    first-class restart SURVEY.md section 5 asks for. ``max_chunks`` stops
    the host loop early (simulated interruption, used by the resume test)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.common import ensure_dir, make_disc_phi_init
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.io import EnergyLogger, load_checkpoint, save_checkpoint
    from pyrmt_tpu.ops.stress import smoothed_heaviside
    from pyrmt_tpu.sim import RMTConfig, diverged, make_init_state, make_step

    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    centers = pack_positions(S, R)
    phi_inits = tuple(make_disc_phi_init(x, y, R) for (x, y) in centers)

    cfg = RMTConfig(
        grid=g, mu_s=1.0, kappa=0.0, rho_s=rho_ratio, eta_s=0.0,
        mu_f=5e-3, rho_f=1.0, g_y=-g0, w_t_cells=2.0,
        k_rep=2.0, w_c_cells=3.0,
        scheme="semilagrangian", bc_type="neumann", variable_rho=True,
        num_layers=3, CFL=0.2, dt_min_cap=1e-3, cg_tol=1e-6, cg_maxiter=200,
    )
    if cfg_overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **cfg_overrides)
    out_dir = ensure_dir(os.path.join(out_root, f"sedimentation_N{N}_S{S}"))
    ckpt_path = os.path.join(out_dir, "checkpoint.npz")
    csv_path = os.path.join(out_dir, "settling.csv")
    meta_path = os.path.join(out_dir, "resume_meta.npz")

    step = make_step(cfg, free_slip_box_bc, phi_inits, dtype=dt_)
    log = EnergyLogger()
    areas0 = None
    if resume and os.path.exists(ckpt_path):
        state = load_checkpoint(ckpt_path)
        if os.path.exists(csv_path):
            log = EnergyLogger.from_csv(csv_path)
        if os.path.exists(meta_path):
            with np.load(meta_path) as m:
                areas0 = m["areas0"]
        if verbose:
            print(f"[sedimentation] RESUMED from {ckpt_path} at "
                  f"t={float(state.t):.4f} (step {int(state.step)}, "
                  f"{len(log.rows)} logged rows)")
    else:
        state = make_init_state(cfg, phi_inits, dtype=dt_)
    t_end_j = jnp.asarray(t_end, dt_)
    X, Y = g.coords(dtype=dt_)

    @jax.jit
    def chunk(s):
        def body(carry, _):
            s, _aux, it_max = carry
            s2, aux = step(s, t_end_j)
            return (s2, aux, jnp.maximum(it_max, aux["cg_iters"])), None

        s1, aux1 = step(s, t_end_j)
        (s2, aux, it_max), _ = jax.lax.scan(
            body, (s1, aux1, aux1["cg_iters"]), None, length=log_every - 1)
        phis = aux["phis"]                          # (S, Ny, Nx)
        w = 1.0 - smoothed_heaviside(phis, cfg.w_t)
        wsum = jnp.sum(w, axis=(1, 2))
        xc = jnp.sum(w * X, axis=(1, 2)) / wsum
        yc = jnp.sum(w * Y, axis=(1, 2)) / wsum
        areas = wsum * g.dx * g.dy
        ke = 0.5 * jnp.sum(s2.u**2 + s2.v**2) * g.dx * g.dy
        # min pairwise centre distance (the impenetrability metric)
        dx_ = xc[:, None] - xc[None, :]
        dy_ = yc[:, None] - yc[None, :]
        d2 = dx_**2 + dy_**2 + jnp.eye(S, dtype=dt_) * 1e9
        dmin = jnp.sqrt(jnp.min(d2))
        ty = s2.t.dtype
        stats = jnp.concatenate([
            jnp.stack([s2.t, dmin.astype(ty), ke.astype(ty),
                       jnp.mean(yc).astype(ty), jnp.min(aux["J"]).astype(ty),
                       it_max.astype(ty)]),
            yc.astype(ty), areas.astype(ty)])
        return s2, stats

    if verbose:
        print(f"[sedimentation] N={N} S={S} R={R} rho_s/rho_f={rho_ratio} "
              f"contact pairs={S*(S-1)//2} dtype={dtype}")
    nsteps = len(log.rows) * log_every
    n_chunks = 0
    t_wall = time.perf_counter()
    while float(state.t) < t_end:
        state, stats = chunk(state)
        nsteps += log_every
        n_chunks += 1
        arr = np.asarray(stats)
        t, dmin, ke, ybar, minJ, itmax = map(float, arr[:6])
        areas = arr[6 + S:6 + 2 * S]
        if areas0 is None:
            areas0 = areas.copy()
            np.savez(meta_path, areas0=areas0)
        adrift = float(np.max(np.abs(areas / areas0 - 1.0)))
        log.log(t=t, dmin=dmin, ke=ke, ybar=ybar, minJ=minJ,
                cg_iters_max=itmax, area_drift=adrift)
        if verbose and nsteps % (4 * log_every) == 0:
            print(f"  step {nsteps:5d} t={t:5.3f} ybar={ybar:.3f} "
                  f"dmin={dmin:.4f} (2R={2*R:.3f}) KE={ke:.2e} "
                  f"minJ={minJ:.3f} cg_max={itmax:.0f} "
                  f"area drift={adrift*100:.2f}%")
        if n_chunks % ckpt_every == 0:
            save_checkpoint(ckpt_path, state)
            log.to_csv(csv_path)
        if bool(diverged(state)):
            print("  [diverged]")
            break
        if max_chunks is not None and n_chunks >= max_chunks:
            save_checkpoint(ckpt_path, state)
            log.to_csv(csv_path)
            if verbose:
                print(f"  [stopped after {n_chunks} chunks "
                      f"(max_chunks); checkpoint saved]")
            break
    wall = time.perf_counter() - t_wall

    log.to_csv(csv_path)
    rows = log.array("t", "dmin", "ke", "ybar", "minJ", "cg_iters_max",
                     "area_drift")
    blew_up = bool(diverged(state))
    gap_floor = 2 * R - cfg.w_c     # shells may compress into the bump range
    summary = dict(
        stable=not blew_up,
        dmin=float(np.min(rows[:, 1])), gap_floor=gap_floor,
        no_passthrough=bool(np.min(rows[:, 1]) > gap_floor),
        ybar_final=float(rows[-1, 3]),
        ybar_monotone=bool(np.all(np.diff(rows[:, 3]) < 1e-4)),
        ke_final=float(rows[-1, 2]), ke_peak=float(np.max(rows[:, 2])),
        minJ=float(np.min(rows[:, 4])),
        cg_iters_max=float(np.max(rows[:, 5])),
        area_drift=float(np.max(rows[:, 6])),
        steps=nsteps, wall_s=wall,
        steps_per_s=(n_chunks * log_every) / wall if n_chunks else 0.0,
    )
    if verbose:
        print(f"[sedimentation] stable={summary['stable']}  min pair "
              f"distance {summary['dmin']:.4f} > floor {gap_floor:.4f}: "
              f"{summary['no_passthrough']}")
        print(f"  mean height {rows[0, 3]:.3f} -> {summary['ybar_final']:.3f} "
              f"(monotone: {summary['ybar_monotone']}); KE peak "
              f"{summary['ke_peak']:.2e} -> final {summary['ke_final']:.2e}")
        print(f"  minJ {summary['minJ']:.3f}  max area drift "
              f"{summary['area_drift']*100:.2f}%  CG max "
              f"{summary['cg_iters_max']:.0f}  ({nsteps} steps, {wall:.1f}s, "
              f"{summary['steps_per_s']:.1f} steps/s)")
    return log.rows, summary


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()
    out_root = cli_out_root()
    import jax

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(argv[0]) if len(argv) > 0 else 256
    S = int(argv[1]) if len(argv) > 1 else 10
    dtype = "float64" if jax.config.jax_enable_x64 else "float32"
    run(N=N, S=S, dtype=dtype, resume="--resume" in sys.argv,
        out_root=out_root)
