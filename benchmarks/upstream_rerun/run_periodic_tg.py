"""Arbitration: the REFERENCE's own periodic stack on the Taylor-Green
vortex it was written for (pyRMT/functions.py:1092-1094 names Taylor-Green
as the periodic use case; no upstream driver exists).

Runs the unmodified upstream momentum + projection loop (pure-Python numba
stub, like run_contact.py) with bc_type='periodic' on the doubly-periodic
decaying TG vortex at N=65, f64, fixed dt=5e-4 — the identical protocol
benchmarks/periodic_taylor_green.py validates this framework on. The
velocity BC closure wraps the overlap row/col (the layout the upstream
periodic solver itself assumes, functions.py:1126-1134).

Expected (measured) outcome: upstream's momentum stencils are one-sided at
the boundary ring (pyRMT/utils.py closures feed velocity_rhs
unconditionally), inconsistent with the periodic-symbol FFT projection —
the incremental pressure feedback amplifies at the ring and the run blows
up in a few hundred steps, while this framework's periodic-wrap stencils
(docs/DESIGN.md #10) track the analytic decay rate to <1%.
"""
import sys
import time

sys.path.insert(0, "/tmp/refrun")
sys.path.insert(0, "/root/reference")
import numpy as np

from pyRMT import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 65
nu = 0.01
U0 = 0.5
dt = 5e-4
t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 0.6

X, Y, dx, dy = F.create_grid(N, N, 1.0, 1.0)
u = U0 * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
v = -U0 * np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y)
p = np.zeros_like(u)
phi = np.ones_like(u)            # pure fluid: mu_s = 0, H == 1
X1, X2 = X.copy(), Y.copy()
w_t = 2.0 * dx
eig = F._precompute_poisson_eigenvalues_periodic(N, N, dx, dy)


def periodic_wrap_bc(u, v):
    u[:, -1] = u[:, 0]
    u[-1, :] = u[0, :]
    v[:, -1] = v[:, 0]
    v[-1, :] = v[0, :]
    return u, v


rate_exact = 16.0 * np.pi**2 * nu
print(f"[upstream periodic TG] N={N} nu={nu} dt={dt} analytic KE rate "
      f"{rate_exact:.4f}", flush=True)
t = 0.0
step = 0
t0 = time.time()
ts, kes = [], []
while t < t_end:
    try:
        u, v, *_ = F.momentum_step_rk4(
            u, v, p, X1, X2, periodic_wrap_bc, 0.0, 0.0, 0.0, dx, dy, dt,
            1.0, 1.0, phi, nu, w_t)
        u, v, p, _, _ = F.pressure_projection_amg(
            u, v, dx, dy, dt, 1.0, periodic_wrap_bc, p_prev=p,
            eigenvalues=eig, bc_type="periodic")
    except FloatingPointError as e:
        print(f"  DIVERGED (FloatingPointError) at t={t:.4f}, step {step}: {e}")
        break
    t += dt
    step += 1
    if step % 100 == 0:
        ke = 0.5 * np.sum(u**2 + v**2) * dx * dy
        finite = np.all(np.isfinite(u)) and np.all(np.isfinite(p))
        print(f"  step {step:5d} t={t:.4f} KE={ke:.5e} max|u|="
              f"{np.max(np.abs(u)):.3e} finite={finite}", flush=True)
        if not finite or np.max(np.abs(u)) > 1e3:
            print(f"  BLOWN UP at t={t:.4f} (step {step})")
            break
        ts.append(t)
        kes.append(ke)
if len(ts) > 3 and np.all(np.isfinite(kes)):
    rate = np.polyfit(ts, np.log(kes), 1)[0]
    print(f"[upstream periodic TG] measured KE rate {rate:.4f} vs analytic "
          f"{-rate_exact:.4f} (rel err {abs(rate + rate_exact)/rate_exact:.2%})")
print(f"[upstream periodic TG] done: {step} steps, {time.time()-t0:.1f}s")
