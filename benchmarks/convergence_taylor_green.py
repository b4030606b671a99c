"""Spatial convergence study for the soft disc in a Taylor-Green vortex.

Parity with the reference driver benchmarks/convergence_taylor_green.py
(Jain et al. 2019, Fig. 15): fixed-dt runs at N in ``grids`` vs a finest
reference grid; L2 errors of |u|, p, X1 (solid-restricted), and the scalar
KE/SE; observed orders from log-log slopes plus reference-free Richardson
orders from factor-2 triplets.

Usage:
    python benchmarks/convergence_taylor_green.py [scheme]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def simulate_tg(N, scheme, t_end=0.25, dt=1.0e-4, stress_band=False,
                dtype="float32", num_layers=3, sl_interp="bilinear",
                sl_band_guard=3.0):
    """Run disc-in-TG to t_end with FIXED dt; return final fields + energies."""
    import jax
    import jax.numpy as jnp

    from benchmarks.common import make_disc_phi_init, taylor_green_velocity
    from pyrmt_tpu.bcs import free_slip_box_bc
    from pyrmt_tpu.diagnostics import compute_kinetic_energy, compute_strain_energy
    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.sim import RMTConfig, make_init_state, make_step

    dt_ = jnp.float64 if dtype == "float64" else jnp.float32
    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    phi_init = make_disc_phi_init(0.5, 0.5, 0.2)
    cfg = RMTConfig(
        grid=g, mu_s=1.0, kappa=0.0, rho_s=1.0, eta_s=0.0, mu_f=1.0e-3,
        rho_f=1.0, w_t_cells=2.0, scheme=scheme, stress_band=stress_band,
        # band mode: ceil(w_t/dx)+2 for the measured stability rule
        # (benchmarks/README.md section stress_band)
        num_layers=num_layers, CFL=0.2, sl_interp=sl_interp,
        sl_band_guard=sl_band_guard,
        fixed_dt=dt,  # TRULY fixed: at N>=1024 the adaptive viscous
        # constraint (CFL*dx^2/(4 mu_f) < 1e-4) would otherwise silently
        # bind below the intended step and the leg would stop short of t_end
    )
    step = make_step(cfg, free_slip_box_bc, (phi_init,), dtype=dt_)
    X, Y = g.coords(dtype=dt_)
    u0, v0 = taylor_green_velocity(np.asarray(X), np.asarray(Y), U0=0.05)
    u0, v0 = free_slip_box_bc(jnp.asarray(u0, dt_), jnp.asarray(v0, dt_))
    state = make_init_state(cfg, (phi_init,), u0=u0, v0=v0, dtype=dt_)

    nsteps = int(round(t_end / dt))
    t_end_j = jnp.asarray(1e9, dt_)  # never clip: we count steps exactly

    @jax.jit
    def run_all(s):
        def body(carry, _):
            s, _ = carry
            return step(s, t_end_j), None

        s1, aux1 = step(s, t_end_j)
        (s2, aux), _ = jax.lax.scan(body, (s1, aux1), None, length=nsteps - 1)
        return s2, aux

    state, aux = run_all(state)
    phi = aux["phis"][0]
    ke = float(compute_kinetic_energy(state.u, state.v, cfg.rho_f, cfg.rho_s,
                                      phi, cfg.w_t, g.dx, g.dy))
    se = float(compute_strain_energy(state.X1[0], state.X2[0], phi, cfg.mu_s,
                                     g.dx, g.dy, kappa=cfg.kappa))
    return dict(
        N=N, dx=g.dx, X=np.asarray(X), Y=np.asarray(Y),
        a=np.asarray(state.u), b=np.asarray(state.v), p=np.asarray(state.p),
        X1=np.asarray(state.X1[0]), X2=np.asarray(state.X2[0]),
        phi=np.asarray(phi), ke=ke, se=se,
    )


def _sample_ref_on(coarse, ref, key):
    from scipy.interpolate import RegularGridInterpolator

    xr = np.linspace(0, 1, ref["N"])
    f = RegularGridInterpolator((xr, xr), ref[key], bounds_error=False,
                                fill_value=None)
    pts = np.column_stack([coarse["Y"].ravel(), coarse["X"].ravel()])
    return f(pts).reshape(coarse["X"].shape)


def l2(err, mask=None):
    if mask is not None:
        err = err[mask]
    return float(np.sqrt(np.mean(err**2)))


def richardson_order(values):
    """Reference-free observed order from factor-2-spaced grids."""
    out = []
    for i in range(len(values) - 2):
        (N0, q0), (N1, q1), (N2, q2) = values[i], values[i + 1], values[i + 2]
        d_coarse = q1 - q0
        d_fine = q2 - q1
        if abs(d_fine) > 0:
            out.append((N2, float(np.log(abs(d_coarse) / abs(d_fine)) / np.log(2.0))))
    return out


def run(scheme="semilagrangian", grids=(32, 64, 128), N_ref=256, t_end=0.25,
        dt=1.0e-4, stress_band=False, dtype="float32", out_root="outputs",
        verbose=True, cache=False, num_layers=3, sl_interp="bilinear",
        sl_band_guard=3.0):
    if verbose:
        print(f"[convergence-TG] scheme={scheme} grids={grids} ref={N_ref} "
              f"t={t_end} dt={dt} dtype={dtype} stress_band={stress_band}")
    from benchmarks.common import ensure_dir

    # cache tags: '_bicubic' = band-guarded (the sl_interp='bicubic'
    # default), '_bicubic_raw' = guard disabled (the pre-guard variant;
    # its recorded caches/orders live under that tag)
    tag = (f"convergence_tg_{scheme}" + ("_band" if stress_band else "")
           + (f"_L{num_layers}" if num_layers != 3 else "")
           + (f"_{sl_interp}" if sl_interp != "bilinear" else "")
           + ("_raw" if sl_interp != "bilinear" and sl_band_guard <= 0.0
              else ""))
    out_dir = ensure_dir(os.path.join(out_root, tag))
    sols = {}
    for N in list(grids) + [N_ref]:
        # per-N field cache: the N=512 f64 reference leg alone is hours of
        # single-core CPU — a crash/restart must not lose completed legs
        cpath = os.path.join(out_dir, f"sol_N{N}_{dtype}_t{t_end}_dt{dt}.npz")
        if cache and os.path.exists(cpath):
            with np.load(cpath) as z:
                sols[N] = {k: (z[k] if z[k].ndim else z[k].item())
                           for k in z.files}
            if verbose:
                print(f"  N={N:4d} (cached: {cpath})")
            continue
        t0 = time.perf_counter()
        sols[N] = simulate_tg(N, scheme, t_end, dt, stress_band, dtype,
                              num_layers=num_layers, sl_interp=sl_interp)
        if verbose:
            s = sols[N]
            print(f"  N={N:4d} dx={s['dx']:.5f} ke={s['ke']:.6e} "
                  f"se={s['se']:.6e}  ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        if cache:
            np.savez_compressed(cpath, **sols[N])

    ref = sols[N_ref]
    rows = []
    for N in grids:
        c = sols[N]
        umag_c = np.hypot(c["a"], c["b"])
        umag_r = np.hypot(_sample_ref_on(c, ref, "a"), _sample_ref_on(c, ref, "b"))
        p_r = _sample_ref_on(c, ref, "p")
        p_r -= p_r.mean()
        pc = c["p"] - c["p"].mean()
        X1_r = _sample_ref_on(c, ref, "X1")
        solid = c["phi"] <= 0
        rows.append((
            c["dx"],
            l2(umag_c - umag_r),
            l2(pc - p_r),
            l2(c["X1"] - X1_r, mask=solid),
            abs(c["ke"] - ref["ke"]),
            abs(c["se"] - ref["se"]),
        ))
        if verbose:
            print(f"  N={N:4d} E_v={rows[-1][1]:.3e} E_p={rows[-1][2]:.3e} "
                  f"E_X1={rows[-1][3]:.3e} E_ke={rows[-1][4]:.3e} "
                  f"E_se={rows[-1][5]:.3e}")

    ke_seq = [(N, sols[N]["ke"]) for N in sorted(sols)]
    se_seq = [(N, sols[N]["se"]) for N in sorted(sols)]
    if verbose:
        print("  Richardson (reference-free) scalar orders:")
        for nm, seq in (("ke", ke_seq), ("se", se_seq)):
            for Ntrip, pord in richardson_order(seq):
                print(f"    {nm} triplet ->N={Ntrip}: p = {pord:.2f}")

    rows = np.array(rows)
    dxs = rows[:, 0]
    names = ["|u|", "p", "X1", "ke", "se"]
    orders = {}
    for k, nm in enumerate(names):
        E = rows[:, k + 1]
        good = E > 0
        orders[nm] = (
            float(np.polyfit(np.log(dxs[good]), np.log(E[good]), 1)[0])
            if good.sum() > 1 else float("nan")
        )
    if verbose:
        print(f"  observed orders vs reference N={N_ref}:")
        for nm in names:
            print(f"    {nm:4s}: p = {orders[nm]:.2f}")

    np.savetxt(os.path.join(out_dir, "errors.csv"), rows, delimiter=",",
               header="dx,E_v,E_p,E_X1,E_ke,E_se", comments="")
    return orders


if __name__ == "__main__":
    from benchmarks.common import apply_cli_platform, cli_out_root

    apply_cli_platform()  # consumes --cpu; --f64 sets jax_enable_x64
    out_root = cli_out_root()
    import jax

    argv = sys.argv[1:]
    stress_band = "--stress-band" in argv
    full = "--full" in argv
    cache = "--cache" in argv
    bicubic = "--bicubic" in argv or "--bicubic-raw" in argv
    bicubic_raw = "--bicubic-raw" in argv
    argv = [a for a in argv
            if a not in ("--stress-band", "--full", "--f64", "--cache",
                         "--bicubic", "--bicubic-raw")]
    scheme = argv[0] if argv else "semilagrangian"
    dtype = "float64" if jax.config.jax_enable_x64 else "float32"
    kw = dict(scheme=scheme, stress_band=stress_band, dtype=dtype, cache=cache,
              sl_interp="bicubic" if bicubic else "bilinear",
              sl_band_guard=0.0 if bicubic_raw else 3.0, out_root=out_root)
    if full:
        kw.update(grids=(32, 64, 128, 256), N_ref=512)
    run(**kw)
