"""Run the REFERENCE convergence_taylor_green study on this box.

Arbitrates the published convergence row (reference benchmarks/README.md:
default mode SE ~2.0, KE ~2, |u| ~1.2, p ~0.76; band mode p ~1.08) by
executing the reference's own driver at its exact published protocol
(grids 32..256, N_ref=512, t_end=0.25, dt=1e-4), with the numba stub plus
the pinned-equivalent vectorized kernels from fast_kernels.py (see
check_equivalence.py for the pin).

    python benchmarks/upstream_rerun/run_convergence.py [default|band]
"""
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)             # numba/pyamg stubs
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/benchmarks")

import pyRMT.functions  # noqa: F401  (import before install())
import fast_kernels
fast_kernels.install()

from benchmarks import convergence_taylor_green as conv  # noqa: E402

mode = sys.argv[1] if len(sys.argv) > 1 else "default"
stress_band = (mode == "band")
workdir = "/tmp/refrun_conv_" + mode
os.makedirs(workdir, exist_ok=True)
os.chdir(workdir)

t0 = time.time()
orders = conv.run(scheme="semilagrangian", grids=(32, 64, 128, 256),
                  N_ref=512, t_end=0.25, dt=1.0e-4, stress_band=stress_band)
print(f"[upstream-convergence mode={mode}] orders: "
      + "  ".join(f"{k}={v:.3f}" for k, v in orders.items())
      + f"   ({time.time()-t0:.0f}s)")
