import sys, time
sys.path.insert(0, "/tmp/refrun")
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/benchmarks")
import numpy as np
t0 = time.time()
from benchmarks import two_disc_contact
print(f"[import ok, {time.time()-t0:.1f}s]", flush=True)
t_end = float(sys.argv[1]) if len(sys.argv) > 1 else 0.9
two_disc_contact.run(N=64, t_end=t_end, V0=0.15, k_rep=2.0, out_root="/tmp/refrun/outputs")
