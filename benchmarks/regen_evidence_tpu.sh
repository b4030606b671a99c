#!/usr/bin/env bash
# Regenerate the TPU/f32 validation logs under the CURRENT perf defaults
# (HIGH-precision DCT matmuls + halo-slab kernel operands). Serial: only one
# process may hold the TPU, and each driver pays a multi-minute remote
# compile — never interrupt a run mid-compile (see CLAUDE.md).
#
#   nohup bash benchmarks/regen_evidence_tpu.sh > /tmp/regen_tpu.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs/logs

stamp() { echo "=== [$(date '+%F %T')] $*"; }

go() { # go <logfile> <cmd...>
  local log="$1"; shift
  stamp "-> $log : $*"
  "$@" > "outputs/logs/$log" 2>&1
  stamp "done: $log (exit $?)"
}

go st_drop_N64_tpu.log      python benchmarks/surface_tension_drop.py 64 0.1 0.25
go ghia_re100_N129_tpu.log  python benchmarks/lid_driven_cavity.py 100 129
go ghia_re1000_N129_tpu.log python benchmarks/lid_driven_cavity.py 1000 129 --tol 5e-6
go ghia_re1000_N257_tpu.log python benchmarks/lid_driven_cavity.py 1000 257 --tol 5e-6
go sd128_tpu.log            python benchmarks/soft_disc_in_lid_driven.py 128 semilagrangian 8.0
go tg_N128_tpu.log          python benchmarks/disc_in_taylor_green.py 128 semilagrangian
go contact_N64_tpu.log      python benchmarks/two_disc_contact.py 64 1.5 0.15 2.0
go tg_collision_N128_tpu.log python benchmarks/two_disc_tg_collision.py 128 2.0

go st_drop_balanced_tpu.log python benchmarks/surface_tension_drop.py 64 0.1 0.25 --balanced --kstar
go density_contrast_N128_tpu.log python benchmarks/density_contrast_disc.py 128 10

stamp "ALL DONE"
