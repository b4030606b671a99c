"""Minimal end-to-end example: a soft disc in a lid-driven cavity.

Shows the whole public workflow in ~30 lines: configure, build the jitted
step, run scanned chunks, checkpoint, resume, and plot.

    python examples/soft_disc_minimal.py [--cpu]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.common import apply_cli_platform

apply_cli_platform()

import jax
import jax.numpy as jnp

from pyrmt_tpu import (
    Grid,
    RMTConfig,
    make_init_state,
    make_lid_bc,
    make_run_chunk,
    make_step,
)
from pyrmt_tpu.io import load_checkpoint, save_checkpoint

g = Grid(Nx=64, Ny=64, Lx=1.0, Ly=1.0)


def phi_disc(X1, X2):  # analytic level set — the solid is where phi <= 0
    return jnp.sqrt((X1 - 0.6) ** 2 + (X2 - 0.5) ** 2) - 0.2


cfg = RMTConfig(grid=g, mu_s=0.1, eta_s=0.01, mu_f=0.01, rho_f=1.0, rho_s=1.0)
bc = make_lid_bc(lid_speed=1.0)

step = make_step(cfg, bc, (phi_disc,))          # ONE jitted XLA program
state = make_init_state(cfg, (phi_disc,))
run100 = make_run_chunk(step, 100)              # 100 steps per dispatch

t_end = jnp.asarray(2.0, jnp.float32)
for _ in range(5):
    state, _ = run100(state, t_end)
    print(f"t={float(state.t):.3f}  step={int(state.step)}  "
          f"max|u|={float(jnp.max(jnp.hypot(state.u, state.v))):.3f}")

save_checkpoint("/tmp/soft_disc_ckpt.npz", state)      # full SimState
resumed = load_checkpoint("/tmp/soft_disc_ckpt.npz")   # resume is exact
state2, _ = run100(resumed, t_end)
print(f"resumed -> t={float(state2.t):.3f}")
