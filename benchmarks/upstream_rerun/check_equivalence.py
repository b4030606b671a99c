"""Pin the fast_kernels replicas against the pure-Python upstream execution.

Runs the reference's own simulate_tg (convergence_taylor_green.py) at N=64
for `nsteps` fixed-dt steps twice -- once with the stubbed pure-Python numba
kernels, once with fast_kernels installed -- and reports max abs diffs over
every returned field. Expected: 0.0 for everything except the extrapolated
band of X1/X2 (and its downstream couplings), which differ at the pairwise-
vs-sequential summation roundoff level (~1e-15 relative).

    python benchmarks/upstream_rerun/check_equivalence.py [nsteps]
"""
import os
import sys
import importlib
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)             # numba/pyamg stubs
sys.path.insert(0, "/root/reference")


def run_once(fast, nsteps):
    # fresh import so module-level bindings are rebuilt per variant
    for m in list(sys.modules):
        if m.startswith(("pyRMT", "benchmarks")) or m == "fast_kernels":
            del sys.modules[m]
    sys.path.insert(0, "/root/reference/benchmarks")
    import pyRMT.functions  # noqa: F401
    if fast:
        import fast_kernels
        fast_kernels.install()
    conv = importlib.import_module("benchmarks.convergence_taylor_green")
    dt = 1.0e-4
    return conv.simulate_tg(64, "semilagrangian", t_end=nsteps * dt, dt=dt)


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"[equivalence] N=64, {nsteps} steps, dt=1e-4, default stress mode")
    ref = run_once(fast=False, nsteps=nsteps)
    fst = run_once(fast=True, nsteps=nsteps)
    worst_field = 0.0
    for key in ("a", "b", "p", "X1", "X2", "phi"):
        d = float(np.max(np.abs(ref[key] - fst[key])))
        scale = float(np.max(np.abs(ref[key]))) or 1.0
        print(f"  {key:3s}: max|diff| = {d:.3e}   (rel {d/scale:.3e})")
        worst_field = max(worst_field, d / scale)
    worst_scalar = 0.0
    for key in ("ke", "se"):
        d = abs(ref[key] - fst[key])
        print(f"  {key:3s}: |diff| = {d:.3e}   (value {ref[key]:.6e})")
        worst_scalar = max(worst_scalar, d)
    # gates: field roundoff accumulation stays >=4 decades below the
    # smallest convergence-study error scale (~1e-6); scalar energies to
    # near machine epsilon in absolute terms
    ok = worst_field < 1e-10 and worst_scalar < 1e-11
    print(f"[equivalence] worst field rel {worst_field:.3e} "
          f"(gate 1e-10), worst scalar abs {worst_scalar:.3e} "
          f"(gate 1e-11) -> {'OK' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
