"""Headline benchmark: FSI steps/sec, soft disc in lid-driven cavity.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference (Numba, 8 CPU threads) does ~31 ms/step at N=128
(docs/PERFORMANCE.md:3-5). Its kernels are O(N^2) and the DCT is
O(N^2 log N), so at the target N=1024 the projected reference step is
31 ms * 64 = ~1.98 s (kernel-dominated; log-factor ignored — conservative in
the reference's favour). vs_baseline = projected_ref_step_time / our_step_time.

Usage: python bench.py [N] [steps]

The default 2000-step chunk amortises this box's fixed per-dispatch tunnel
latency (~25 ms per chunk through the remote TPU frontend) to ~1% of the
step time; the resulting number matches the device-busy time from
jax.profiler traces. Best of 3 timed chunks after one warmup chunk.
"""
from __future__ import annotations

import json
import sys
import time


def main(N=1024, n_steps=2000, use_pallas=False, no_slab=False,
         dct_highest=False, sl_bicubic=False, rebase=False, areafix=False,
         reinit=None, periodic=False, donate=False):
    import pyrmt_tpu.runtime as rt

    rt.setup()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from pyrmt_tpu.sim import make_init_state, make_run_chunk, make_step
    from __graft_entry__ import _flagship

    cfg, bc, phi_inits = _flagship(N, jnp.float32)
    if use_pallas:
        cfg = dataclasses.replace(cfg, use_pallas_rhs=True)
    # ablation toggles (defaults: slab operands on, dct 'auto' -> high on TPU)
    if no_slab:
        cfg = dataclasses.replace(cfg, kernel_slab_halo=False)
    if dct_highest:
        cfg = dataclasses.replace(cfg, dct_precision="highest")
    if sl_bicubic:
        # Catmull-Rom final gather — fused into the RMT-block kernel since
        # round 4 (band-guarded; kernels/rmt_block._bicubic_local)
        cfg = dataclasses.replace(cfg, sl_interp="bicubic")
    # Robustness-config rows (round 5): these route through the SPLIT fused
    # tier (sim.rmt_block_split_eligible — kernel A + exact XLA phi chain)
    # instead of silently dropping to the all-XLA path as in round 4.
    if rebase:
        cfg = dataclasses.replace(cfg, map_rebase_minj=0.5)
    if areafix:
        cfg = dataclasses.replace(cfg, phi_area_fix=True)
    if reinit:
        cfg = dataclasses.replace(cfg, reinit_method=reinit)
    u0 = v0 = None
    if periodic:
        # round 5 (VERDICT r4 #3): the doubly-periodic stack's perf row —
        # same solid, periodic wrap BCs (FFT projection + wrap momentum
        # kernel + the fused RMT block, seam-clear solid), seeded with a
        # decaying TG vortex so the flow/dt are nontrivial
        from pyrmt_tpu.bcs import periodic_bc

        cfg = dataclasses.replace(cfg, bc_type="periodic")
        bc = periodic_bc
        X, Y = cfg.grid.coords(jnp.float32)
        u0 = 0.5 * jnp.sin(2 * jnp.pi * X) * jnp.cos(2 * jnp.pi * Y)
        v0 = -0.5 * jnp.cos(2 * jnp.pi * X) * jnp.sin(2 * jnp.pi * Y)
    step = make_step(cfg, bc, phi_inits, dtype=jnp.float32)
    state = make_init_state(cfg, phi_inits, u0=u0, v0=v0, dtype=jnp.float32)
    t_end = jnp.asarray(1e9, jnp.float32)

    if rebase:
        # TPU production path for rebasing: two-executable chunked runner
        # ('analytic' rebuild until a rebase fires, then 'sampled') — the
        # in-graph 'cond' rebuild pays its gather branch per scan step on
        # the TPU toolchain (sim.make_rebase_runner docstring;
        # docs/PERFORMANCE.md round-5 rebasing note)
        from pyrmt_tpu.sim import make_rebase_runner

        chunk = make_rebase_runner(cfg, bc, phi_inits, n_steps,
                                   dtype=jnp.float32, donate=donate)
    else:
        chunk = make_run_chunk(step, n_steps, donate=donate)

    # warmup / compile
    state_w, _ = chunk(state, t_end)
    jax.block_until_ready(state_w.u)

    wall = 1e18
    if donate:
        # donated input buffers are consumed — CHAIN the state through the
        # timed chunks instead of re-running from state_w (same adaptive-dt
        # steady regime; what the N=8192 row needs to fit in HBM)
        s = state_w
        for _ in range(3):
            t0 = time.perf_counter()
            s, _ = chunk(s, t_end)
            jax.block_until_ready(s.u)
            wall = min(wall, time.perf_counter() - t0)
    else:
        for _ in range(3):
            t0 = time.perf_counter()
            state2, ts = chunk(state_w, t_end)
            jax.block_until_ready(state2.u)
            wall = min(wall, time.perf_counter() - t0)

    step_ms = wall / n_steps * 1e3
    steps_per_sec = n_steps / wall

    ref_step_ms_at_128 = 31.0  # docs/PERFORMANCE.md:3-5
    ref_step_ms = ref_step_ms_at_128 * (N / 128.0) ** 2
    vs_baseline = ref_step_ms / step_ms

    variant = ""
    if rebase:
        variant += "_rebase"
    if areafix:
        variant += "_areafix"
    if reinit:
        variant += f"_reinit_{reinit}"
    if sl_bicubic:
        variant += "_bicubic"
    if periodic:
        variant += "_periodic"
    print(json.dumps({
        "metric": f"fsi_steps_per_sec_N{N}" + variant,
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    use_pallas = "--pallas" in sys.argv
    no_slab = "--no-slab" in sys.argv
    dct_highest = "--dct-highest" in sys.argv
    sl_bicubic = "--bicubic" in sys.argv
    rebase = "--rebase" in sys.argv
    areafix = "--areafix" in sys.argv
    periodic = "--periodic" in sys.argv
    donate = "--donate" in sys.argv
    reinit = None
    for a in sys.argv[1:]:
        if a.startswith("--reinit="):
            reinit = a.split("=", 1)[1]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(args[0]) if len(args) > 0 else 1024
    n_steps = int(args[1]) if len(args) > 1 else 2000
    main(N=N, n_steps=n_steps, use_pallas=use_pallas, no_slab=no_slab,
         dct_highest=dct_highest, sl_bicubic=sl_bicubic, rebase=rebase,
         areafix=areafix, reinit=reinit, periodic=periodic, donate=donate)
