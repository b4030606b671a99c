"""Coupled moving capillary drop — the case the reference documents as open.

The reference validates surface tension only on a STATIC drop (fixed
analytic interface) and states the moving, fully-coupled low-stiffness case
is "not yet robust — parasitic currents feed back through the
reference-map-advected interface and can grow. Making the coupled case
robust needs a balanced-force CSF and/or a better curvature estimate"
(reference benchmarks/README.md, surface-tension caveat). That upgrade is
implemented here (physics.balanced_csf_forces, RMTConfig.st_method) — this
driver runs the coupled case it enables and validates it quantitatively:

  * an initially ELLIPTIC near-fluid drop (mu_s ~ 1e-3, gamma = 0.1)
    oscillates toward circular under surface tension through the FULL RMT
    loop (reference-map advection + extrapolation + phi rebuild + CSF +
    projection every step);
  * the measured n=2 oscillation period is compared against the inviscid
    Rayleigh result for a 2D drop (Lamb, Hydrodynamics §275):
        omega_n^2 = (n^3 - n) gamma / ((rho_in + rho_out) R^3),
    n=2, rho_in = rho_out = 1  ->  T = 2 pi sqrt(R^3 / (3 gamma));
  * after the ringing decays, the residual velocity is the PARASITIC
    current level of the coupled loop — it must plateau (bounded Ca), not
    grow;
  * drop area drift must stay at interface-resolution level.

Run with --csf to reproduce the reference's cell-centred discretisation on
the same case (the configuration upstream describes as fragile) for a
side-by-side parasitic-current comparison.

Usage:
    python benchmarks/capillary_drop_coupled.py [N] [--csf] [--kstar]
        [--f64] [--cpu]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_ellipse_phi_init(x0, y0, a, b):
    """Quasi-SDF for an ellipse: implicit function normalised by |grad| —
    first-order distance, exact on the interface (adequate for the 3-cell
    transition band; the RMT loop rebuilds phi from the advected map)."""
    def phi_init(X1, X2):
        import jax.numpy as jnp

        fx = (X1 - x0) / a
        fy = (X2 - y0) / b
        r = jnp.sqrt(fx * fx + fy * fy + 1e-30)
        f = r - 1.0                      # implicit function, zero on ellipse
        grad = jnp.sqrt((fx / a) ** 2 + (fy / b) ** 2) / r + 1e-12  # |grad f|
        return f / grad

    return phi_init


def run(N=128, gamma=0.1, R=0.2, ecc=1.15, mu_s=1e-3, mu_f=1e-3,
        t_end=4.5, out_root="outputs", dtype="float32", log_every=100,
        st_method="balanced", kappa_interface=False, verbose=True,
        cfg_overrides=None, tag="", resume=False, ckpt_every=10,
        max_chunks=None):
    """``resume=True`` continues from ``<out_dir>/checkpoint.npz`` (written
    every ``ckpt_every`` chunks) and re-extends the logged history — the
    first-class restart SURVEY.md section 5 asks for (the reference writes
    state but cannot resume, pyRMT/output.py:300-320). ``max_chunks`` stops
    the host loop early (simulated interruption, used by the resume test)."""
    import jax
    import jax.numpy as jnp

    from benchmarks.common import ensure_dir
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.io import EnergyLogger, load_checkpoint, save_checkpoint
    from pyrmt_tpu.sim import RMTConfig, diverged, make_init_state, make_step
    from pyrmt_tpu.ops.stress import smoothed_heaviside

    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    # area-preserving ellipse: a = R*ecc, b = R/ecc
    phi_init = make_ellipse_phi_init(0.5, 0.5, R * ecc, R / ecc)

    cfg = RMTConfig(
        grid=g, mu_s=mu_s, kappa=0.0, rho_s=1.0, eta_s=0.0,
        mu_f=mu_f, rho_f=1.0, gamma=gamma, w_t_cells=2.0,
        st_method=st_method, st_kappa_interface=kappa_interface,
        scheme="semilagrangian", bc_type="neumann",
        num_layers=3, CFL=0.4, dt_min_cap=1e-3,
    )
    if cfg_overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **cfg_overrides)
    suffix = "" if st_method == "balanced" else f"_{st_method}"
    if kappa_interface:
        suffix += "_kstar"
    if tag:
        suffix += f"_{tag}"
    out_dir = ensure_dir(os.path.join(out_root, f"capillary_drop_N{N}{suffix}"))
    ckpt_path = os.path.join(out_dir, "checkpoint.npz")
    csv_path = os.path.join(out_dir, "oscillation.csv")

    step = make_step(cfg, free_slip_box_bc, (phi_init,), dtype=dt_)
    log = EnergyLogger()
    if resume and os.path.exists(ckpt_path):
        state = load_checkpoint(ckpt_path)
        if os.path.exists(csv_path):
            log = EnergyLogger.from_csv(csv_path)
        if verbose:
            print(f"[capillary-drop] RESUMED from {ckpt_path} at "
                  f"t={float(state.t):.4f} (step {int(state.step)}, "
                  f"{len(log.rows)} logged rows)")
    else:
        state = make_init_state(cfg, (phi_init,), dtype=dt_)
    t_end_j = jnp.asarray(t_end, dt_)
    X, Y = g.coords(dtype=dt_)
    T_rayleigh = 2.0 * np.pi * np.sqrt(R**3 / (3.0 * gamma))

    rebasing = cfg.map_rebase_minj > 0.0

    @jax.jit
    def chunk(s):
        def nreb_of(aux):
            return (jnp.sum(aux["rebased"].astype(jnp.int32)) if rebasing
                    else jnp.zeros((), jnp.int32))

        def body(carry, _):
            s, _aux, nreb = carry
            s2, aux = step(s, t_end_j)
            return (s2, aux, nreb + nreb_of(aux)), None

        s1, aux1 = step(s, t_end_j)
        (s2, aux, nreb), _ = jax.lax.scan(
            body, (s1, aux1, nreb_of(aux1)), None, length=log_every - 1)
        phi = aux["phis"][0]
        w = 1.0 - smoothed_heaviside(phi, cfg.w_t)   # solid fraction
        area = jnp.sum(w) * g.dx * g.dy
        wsum = jnp.sum(w)
        xc = jnp.sum(w * X) / wsum
        yc = jnp.sum(w * Y) / wsum
        ixx = jnp.sum(w * (X - xc) ** 2) / wsum
        iyy = jnp.sum(w * (Y - yc) ** 2) / wsum
        # SIGNED x/y deformation (initial stretch is x-aligned): oscillates
        # about 1 at the full mode period (an unsigned max/min aspect would
        # fold the overshoot and halve the apparent period)
        aspect = jnp.sqrt(ixx / iyy)
        umax = jnp.max(jnp.hypot(s2.u, s2.v))
        ty = s2.t.dtype
        return s2, jnp.stack([
            s2.t, aspect.astype(ty), area.astype(ty), umax.astype(ty),
            jnp.min(aux["J"]).astype(ty), nreb.astype(ty)])

    if verbose:
        print(f"[capillary-drop] N={N} gamma={gamma} R={R} ecc={ecc} "
              f"mu_s={mu_s} st_method={st_method} kstar={kappa_interface} "
              f"T_Rayleigh={T_rayleigh:.3f}")
    nsteps = len(log.rows) * log_every
    n_chunks = 0
    t_wall = time.perf_counter()
    while float(state.t) < t_end:
        state, stats = chunk(state)
        nsteps += log_every
        n_chunks += 1
        t, aspect, area, umax, minJ, nreb = map(float, np.asarray(stats))
        log.log(t=t, aspect=aspect, area=area, umax=umax, minJ=minJ,
                rebases=nreb)
        if verbose and nsteps % (5 * log_every) == 0:
            extra = f" rebases={nreb:.0f}" if rebasing else ""
            print(f"  step {nsteps:6d} t={t:6.3f} aspect={aspect:.4f} "
                  f"area={area:.5f} max|u|={umax:.3e} minJ={minJ:.3f}"
                  f"{extra}")
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

    rows = log.array("t", "aspect", "area", "umax")
    blew_up = bool(diverged(state))
    # period from successive aspect-ratio maxima (peak-to-peak)
    a_s = rows[:, 1]
    t_s = rows[:, 0]
    peaks = [i for i in range(1, len(a_s) - 1)
             if a_s[i] >= a_s[i - 1] and a_s[i] > a_s[i + 1]
             and a_s[i] > 1.005]
    troughs = [i for i in range(1, len(a_s) - 1)
               if a_s[i] <= a_s[i - 1] and a_s[i] < a_s[i + 1]
               and a_s[i] < 0.995]
    intervals = []
    for fam in (peaks, troughs):
        if len(fam) >= 2:
            intervals.extend(np.diff(t_s[fam]).tolist())
    period = float(np.mean(intervals)) if intervals else np.nan
    envelope_ratio = np.nan
    if len(peaks) >= 2:
        # decaying (<1) vs growing (>1) ringing — the reference's stated
        # failure mode for this case is parasitic-current GROWTH
        envelope_ratio = float((a_s[peaks[-1]] - 1.0)
                               / (a_s[peaks[0]] - 1.0))
    area0 = float(rows[0, 2])
    area_drift = float(np.max(np.abs(rows[:, 2] - area0)) / area0)
    # parasitic plateau: max |u| over the LAST 20% of the run
    tail = rows[t_s >= 0.8 * t_s[-1]]
    u_tail = float(np.max(tail[:, 3])) if len(tail) else float("nan")
    ca_tail = u_tail * mu_f / gamma
    summary = dict(
        stable=not blew_up, period=period, period_rayleigh=T_rayleigh,
        period_rel_err=(abs(period - T_rayleigh) / T_rayleigh
                        if period == period else float("nan")),
        area_drift=area_drift, umax_tail=u_tail, ca_tail=ca_tail,
        envelope_ratio=envelope_ratio,
        rebases=float(sum(r.get("rebases", 0.0) for r in log.rows)),
        aspect_final=float(a_s[-1]), steps=nsteps, wall_s=wall,
    )
    if verbose:
        print(f"[capillary-drop] stable={summary['stable']}  period="
              f"{period:.3f} vs Rayleigh {T_rayleigh:.3f} "
              f"(rel err {summary['period_rel_err']*100:.1f}%)")
        print(f"  area drift {area_drift*100:.2f}%  tail max|u|="
              f"{u_tail:.3e} (Ca={ca_tail:.1e})  envelope ratio "
              f"{envelope_ratio:.3f}  final aspect "
              f"{summary['aspect_final']:.4f}  ({nsteps} steps, {wall:.0f}s)")
    return log.rows, summary


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()
    out_root = cli_out_root()
    import jax

    st_method = "csf" if "--csf" in sys.argv else "balanced"
    kstar = "--kstar" in sys.argv
    overrides = {}
    tag = ""
    if "--hf" in sys.argv:
        overrides["st_curvature"] = "hf"
        tag = "hf"
    if "--hf-smooth" in sys.argv:
        # stabilised height-function estimator (RMTConfig.st_hf_smooth):
        # tangential height filtering + convex validity/orientation blend
        overrides["st_curvature"] = "hf"
        overrides["st_hf_smooth"] = 2
        tag = "hfsmooth"
    if "--reinit" in sys.argv:
        overrides["reinit_method"] = "fmm"
        tag = (tag + "_reinit") if tag else "reinit"
    if "--areafix" in sys.argv:
        overrides["phi_area_fix"] = True
        tag = (tag + "_areafix") if tag else "areafix"
    if "--bicubic" in sys.argv:
        overrides["sl_interp"] = "bicubic"
        tag = (tag + "_bicubic") if tag else "bicubic"
    for a in sys.argv[1:]:
        if a.startswith("--tend="):
            overrides["_tend"] = float(a.split("=", 1)[1])
        elif a == "--rebase" or a.startswith("--rebase="):
            thr = float(a.split("=", 1)[1]) if "=" in a else 0.5
            overrides["map_rebase_minj"] = thr
            rtag = f"rebase{thr:g}"
            tag = (tag + "_" + rtag) if tag else rtag
    t_end = overrides.pop("_tend", 4.5)
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(argv[0]) if len(argv) > 0 else 128
    dtype = "float64" if jax.config.jax_enable_x64 else "float32"
    run(N=N, st_method=st_method, kappa_interface=kstar, dtype=dtype,
        t_end=t_end, cfg_overrides=overrides or None, tag=tag,
        resume="--resume" in sys.argv, out_root=out_root)
