"""Roofline / MFU audit of the fused FSI step (docs/PERFORMANCE.md section).

Three ingredients, combined into %-of-peak statements per step component:

  1. FLOP counts (``--flops``, CPU): XLA HLO cost analysis of each fused
     kernel's XLA TWIN — the twins compute the same arithmetic as the Pallas
     kernels (parity pinned bitwise in tests/test_pallas.py), so their HLO
     flop counts ARE the kernels' algorithmic flops; the kernels additionally
     recompute a halo margin, reported as the (tile+2*halo)/tile factor.
  2. HBM bytes per kernel call: analytic, from the kernels' BlockSpecs
     (inputs: per-field prev/cur/next slabs; outputs: the written arrays) —
     printed alongside.
  3. Device times (``--trace``, TPU): one jax.profiler trace of a 50-step
     bench chunk; the per-kernel device durations are aggregated from the
     trace.json.gz event stream.

Peaks used for the v5e chip (public numbers): MXU 197 TFLOP/s bf16,
HBM 819 GB/s. The VPU f32 peak is taken as the measured ceiling ~3 TF/s
established in docs/PERFORMANCE.md's measurement note (elementwise f32
throughput; the theoretical VPU number is not published).

Usage:
    python benchmarks/roofline_audit.py --flops          # CPU, prints table
    python benchmarks/roofline_audit.py --trace [N]      # TPU, one trace
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = 1024
S = 1


def _setup(dtype):
    import jax.numpy as jnp

    from pyrmt_tpu.grid import Grid
    from pyrmt_tpu.sim import RMTConfig, make_init_state

    g = Grid(Nx=N, Ny=N, Lx=1.0, Ly=1.0)
    phi_init = lambda X, Y: jnp.sqrt((X - 0.6) ** 2 + (Y - 0.5) ** 2) - 0.2
    cfg = RMTConfig(grid=g, mu_s=0.1, eta_s=0.0, rho_s=1.0, mu_f=0.01,
                    rho_f=1.0, num_layers=3, CFL=0.2, dt_min_cap=1e-3)
    state = make_init_state(cfg, (phi_init,), dtype=dtype)
    return g, cfg, phi_init, state


_FLOPPY = {"add", "sub", "mul", "div", "max", "min", "sqrt", "rsqrt", "sin",
           "cos", "exp", "log", "pow", "integer_pow", "atan2", "rem", "clamp"}
_ELEMWISE = _FLOPPY | {"select_n", "and", "or", "not", "xor", "lt", "le",
                       "gt", "ge", "eq", "ne", "neg", "abs", "sign",
                       "floor", "ceil", "round", "convert_element_type"}


def _count_jaxpr(jaxpr):
    """Algorithmic op count from the jaxpr: each elementwise primitive
    counts its output size once (so shift-add structure is counted as
    written — HLO cost analysis inflates the conv-style lowerings ~20x),
    dot_general counts 2MNK. Returns (arith_flops, total_elementwise_ops) —
    the second includes selects/compares, which consume VPU issue slots
    like flops do."""
    import numpy as np

    flops = 0
    ops = 0
    for eqn in jaxpr.eqns:
        subs = [p for p in eqn.params.values() if hasattr(p, "jaxpr")]
        if subs:
            for p in subs:
                inner = p.jaxpr if hasattr(p.jaxpr, "eqns") else p
                f2, o2 = _count_jaxpr(inner)
                flops += f2
                ops += o2
            continue
        prim = eqn.primitive.name
        size = sum(int(np.prod(ov.aval.shape)) for ov in eqn.outvars)
        if prim in _FLOPPY:
            flops += size
        if prim in _ELEMWISE:
            ops += size
        if prim == "dot_general":
            a = eqn.invars[0].aval.shape
            b = eqn.invars[1].aval.shape
            dims = eqn.params["dimension_numbers"]
            K = int(np.prod([a[i] for i in dims[0][0]]))
            mnk = 2 * (int(np.prod(a)) // K) * (int(np.prod(b)) // K) * K
            flops += mnk
            ops += mnk
    return flops, ops


def flops_audit():
    """CPU: count each component's algorithmic flops from its XLA twin."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float32
    g, cfg, phi_init, state = _setup(dtype)
    dx, dy, w_t = g.dx, g.dy, cfg.w_t
    u = jnp.zeros(g.shape, dtype)
    v = jnp.zeros(g.shape, dtype)
    p = jnp.zeros(g.shape, dtype)
    dt = jnp.asarray(1e-3, dtype)

    def cost(f, *args):
        f2, o2 = _count_jaxpr(jax.make_jaxpr(f)(*args).jaxpr)
        return float(f2), float(o2)

    # --- RMT block twin (rebuild -> advect -> extrapolate -> rebuild ->
    # stress -> Heaviside/blends), exactly sim.make_step's XLA path ---------
    from pyrmt_tpu.ops.advect import advect_semilagrangian_rk4_local
    from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map
    from pyrmt_tpu.ops.stress import smoothed_heaviside, solid_cauchy_stress

    def rmt_twin(u, v, X1s, X2s, dt):
        phis = jnp.stack([phi_init(X1s[i], X2s[i]) for i in range(S)])
        masks = (phis <= 0.0).astype(dtype)
        qs = jnp.concatenate([X1s, X2s], axis=0)
        qs_new = advect_semilagrangian_rk4_local(qs, u, v, dt, dx, dy)
        X1e, X2e = extrapolate_reference_map(
            qs_new[0] * masks[0], qs_new[1] * masks[0], phis[0], dx, dy,
            cfg.num_layers)
        phi2 = phi_init(X1e, X2e)
        sxx, sxy, syy, J = solid_cauchy_stress(
            X1e, X2e, dx, dy, cfg.mu_s, cfg.kappa, phi2)
        H = smoothed_heaviside(phi2, w_t)
        Hf = H  # S == 1
        rho = Hf * cfg.rho_f + (1.0 - H) * cfg.rho_s
        return (X1e, X2e, phi2, sxx, sxy, syy, J, Hf, rho,
                (1 - H) * sxx, (1 - H) * sxy, (1 - H) * syy)

    f_rmt, o_rmt = cost(rmt_twin, u, v, state.X1, state.X2, dt)

    # --- momentum core twin (pre-blended inputs, 4-stage RK4) ---------------
    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.physics import momentum_core

    bc = make_lid_bc(1.0)
    zero = jnp.zeros(g.shape, dtype)
    one = jnp.ones(g.shape, dtype)

    def mom_twin(u, v, p, sxx, sxy, syy, Hf, rho):
        return momentum_core(
            u, v, p, sxx, sxy, syy, Hf, rho, zero, zero, zero, bc,
            eta_s=0.0, dx=dx, dy=dy, dt=dt, mu_f=cfg.mu_f,
            ext_is_zero=True)

    f_mom, o_mom = cost(mom_twin, u, v, p, zero, zero, zero, one, one)

    # --- DCT Poisson solve (matmul lowering — what runs on TPU) -------------
    from pyrmt_tpu.ops.poisson import (
        precompute_dct_matrices,
        precompute_poisson_eigenvalues,
        solve_poisson_dct,
    )

    eig = precompute_poisson_eigenvalues(N, N, dx, dy, dtype=dtype)
    mats = precompute_dct_matrices(N, N, dtype=dtype)

    def dct_twin(rhs):
        return solve_poisson_dct(rhs, eig, dct_mats=mats)

    f_dct, o_dct = cost(dct_twin, p)

    # --- full projection (Rhie-Chow + DCT + correction) ---------------------
    from pyrmt_tpu.ops.projection import pressure_projection

    def proj_twin(u, v, p, rho):
        return pressure_projection(
            u, v, dx, dy, dt, rho, bc, p_prev=p, eigenvalues=eig,
            bc_type="neumann", dct_mats=mats)

    f_proj, o_proj = cost(proj_twin, u, v, p, one)

    # --- analytic HBM bytes of the fused kernels (BlockSpec shapes) ---------
    fb = N * N * 4  # one f32 field
    halo_rmt, tile_rmt = 4 * cfg.num_layers + 4, 128
    halo_mom, tile_mom = 8, 128
    rmt_in = (2 + 2 * S) * fb * (tile_rmt + 2 * halo_rmt) / tile_rmt
    rmt_out = (7 * S + 5) * fb
    mom_in = 8 * fb * (tile_mom + 2 * halo_mom) / tile_mom  # elided field set
    mom_out = 2 * fb
    dct_bytes = 2 * fb + 2 * fb  # rhs in + p out + the two (N,N) matrices

    halo_f_rmt = (tile_rmt + 2 * halo_rmt) / tile_rmt
    halo_f_mom = (tile_mom + 2 * halo_mom) / tile_mom
    print(f"# Roofline audit N={N}, S={S}, f32 (algorithmic jaxpr op counts"
          f" of the XLA twins)")
    rows = [
        ("RMT block twin", f_rmt, o_rmt, rmt_in + rmt_out, halo_f_rmt),
        ("momentum RK4 twin", f_mom, o_mom, mom_in + mom_out, halo_f_mom),
        ("DCT solve (8N^3 matmuls)", f_dct, o_dct, dct_bytes, 1.0),
        ("full projection", f_proj, o_proj, None, 1.0),
    ]
    for name, fl, op, byt, hf in rows:
        line = (f"{name:28s} flops {fl/1e9:7.2f} GF (all-elementwise "
                f"{op/1e9:6.2f} Gop)  x halo {hf:5.3f} = "
                f"{fl*hf/1e9:7.2f} GF")
        if byt is not None:
            line += f"   HBM bytes/call {byt/1e6:6.1f} MB"
        print(line)
    print(f"analytic DCT matmul flops 8N^3 = {8*N**3/1e9:.2f} GF")


def trace_audit(n=N, steps=50):
    """TPU: profile one bench chunk; aggregate per-kernel device times."""
    import glob
    import gzip
    import json

    import jax
    import jax.numpy as jnp

    from pyrmt_tpu.bcs import make_lid_bc
    from pyrmt_tpu.sim import make_run_chunk, make_step

    global N
    N = n
    dtype = jnp.float32
    g, cfg, phi_init, state = _setup(dtype)
    bc = make_lid_bc(1.0)
    step = make_step(cfg, bc, (phi_init,), dtype=dtype)
    chunk = make_run_chunk(step, steps)
    t_end = jnp.asarray(1e9, dtype)
    state, _ = chunk(state, t_end)           # compile + warm
    jax.block_until_ready(state.u)
    logdir = "/tmp/pyrmt_roofline_trace"
    jax.profiler.start_trace(logdir)
    state, _ = chunk(state, t_end)
    jax.block_until_ready(state.u)
    jax.profiler.stop_trace()

    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)
    import collections
    import re

    pid_names, tid_names = {}, {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    # the device's 'XLA Ops' lane holds the leaf-op spans; 'XLA Modules'
    # and host lanes hold enclosing/dispatch spans
    op_lanes = {k for k, nm in tid_names.items()
                if nm == "XLA Ops" and "TPU" in pid_names.get(k[0], "")}
    agg = collections.Counter()
    for e in trace.get("traceEvents", []):
        if (e.get("ph") == "X" and "dur" in e
                and (e["pid"], e["tid"]) in op_lanes):
            name = re.sub(r"\.\d+$", "", e["name"])
            if name.startswith("jit_") or name == "while":
                continue  # enclosing spans, not leaf ops
            agg[name] += e["dur"]
    total = sum(agg.values())
    print(f"# device leaf-op busy {total/1e3/steps:.3f} ms/step over "
          f"{steps} steps ({latest})")
    for name, dur in agg.most_common(20):
        print(f"{dur/1e3/steps:8.4f} ms/step  {name}")


if __name__ == "__main__":
    if "--trace" in sys.argv:
        argv = [a for a in sys.argv[1:] if not a.startswith("--")]
        trace_audit(int(argv[0]) if argv else N)
    else:
        flops_audit()
