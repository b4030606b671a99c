"""pyrmt_tpu — TPU-native (JAX/XLA/Pallas) Reference Map Technique framework.

A ground-up rebuild of the capabilities of samanseifi/pyRMT — fully Eulerian
2D incompressible fluid-structure interaction via the Reference Map Technique
(Jain, Kamrin & Mani 2019, JCP 399:108922) — designed TPU-first:

  * the entire timestep is ONE jitted XLA program over a functional
    ``SimState`` pytree (no host round-trips),
  * stencils are fused whole-array VPU passes; the narrow-band extrapolation
    is fixed-kernel convolutions on the MXU,
  * the Poisson projection is DCT-I/FFT on the XLA FFT path with a
    matrix-free preconditioned CG for variable density (no pyamg),
  * multi-solid FSI is a single vmapped n-solid momentum kernel,
  * multi-chip scaling uses ``jax.sharding`` over a 2D device mesh
    (pyrmt_tpu.parallel).

Public API mirrors the reference package surface (pyRMT/__init__.py) so a
user of the reference finds every capability under a familiar name.
"""

from pyrmt_tpu.grid import Grid, create_grid
from pyrmt_tpu.ops.fd import (
    diff_upwind_3rd,
    grad_central_x_2nd,
    grad_central_x_4th,
    grad_central_y_2nd,
    grad_central_y_4th,
    lap_2nd,
    solve3x3_sym,
)
from pyrmt_tpu.ops.interp import (
    bicubic_interpolate,
    bilinear_interpolate,
    cubic_convolution,
    gather_bicubic_local,
    gather_bicubic_multi,
    gather_bilinear_multi,
)
from pyrmt_tpu.ops.advect import (
    advect_central2_rk3,
    advect_reference_map,
    advect_reference_map_multi,
    advect_semilagrangian_rk4,
    advect_semilagrangian_rk4_multi,
    advect_weno5_rk3,
)
from pyrmt_tpu.ops.stress import smoothed_heaviside, solid_cauchy_stress
from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map
from pyrmt_tpu.ops.levelset import (
    apply_phi_BCs,
    compute_curvature,
    rebuild_phi_from_reference_map,
    reinitialize_level_set,
    reinitialize_phi_PDE,
)
from pyrmt_tpu.ops.contact import compute_contact_force
from pyrmt_tpu.ops.poisson import (
    build_poisson_matrix,
    precompute_poisson_eigenvalues,
    precompute_poisson_eigenvalues_periodic,
    solve_poisson_dct,
    solve_poisson_fft,
    solve_variable_poisson_cg,
    solve_variable_poisson_cg_counted,
)
from pyrmt_tpu.ops.projection import pressure_projection
from pyrmt_tpu.physics import (
    balanced_csf_forces,
    compute_timestep,
    momentum_step_rk4,
    momentum_step_rk4_2solids,
    velocity_rhs_blended,
)
from pyrmt_tpu.diagnostics import (
    compute_kinetic_energy,
    compute_strain_energy,
    compute_viscous_dissipation,
    disc_centroid,
    divergence_2d_interior,
    extract_centerlines,
)
from pyrmt_tpu.bcs import (
    free_slip_box_bc,
    make_lid_bc,
    no_slip_lid_bc,
    noop_bc,
    periodic_bc,
)
from pyrmt_tpu.sim import (
    RMTConfig,
    SimState,
    check_narrow_band,
    diverged,
    make_init_state,
    make_rollout,
    make_run_chunk,
    make_step,
    required_extrapolation_layers,
    run_until,
)
from pyrmt_tpu.diff import (
    make_diff_rollout,
    make_diff_step,
)

__version__ = "0.1.0"

# Reference-compatibility aliases (pyRMT/__init__.py:50-57 keeps old names)
pressure_projection_amg = pressure_projection
velocity_RK4 = momentum_step_rk4
compute_solid_stress = solid_cauchy_stress
extrapolate_transverse_layers_2field = extrapolate_reference_map
advect_semi_lagrangian_rk4 = advect_semilagrangian_rk4
heaviside_smooth_alt = smoothed_heaviside
velocity_rhs_blended_optimized = velocity_rhs_blended
_precompute_poisson_eigenvalues = precompute_poisson_eigenvalues
_precompute_poisson_eigenvalues_periodic = precompute_poisson_eigenvalues_periodic
_solve_poisson_dct = solve_poisson_dct
_solve_poisson_fft = solve_poisson_fft

from pyrmt_tpu.ops.levelset import (  # noqa: E402
    reinitialize_phi_fmm_equivalent as reinitialize_phi_fmm,
)
from pyrmt_tpu.io import output_simulation_data  # noqa: E402, F401

# Fused Pallas kernels (TPU defaults; XLA fallbacks remain the CPU and
# multi-chip paths — see docs/DESIGN.md "Performance model")
from pyrmt_tpu.kernels.extrapolate_fused import (  # noqa: E402, F401
    extrapolate_reference_map_fused,
)
from pyrmt_tpu.kernels.momentum_rk4 import (  # noqa: E402, F401
    momentum_rk4_pallas,
)
from pyrmt_tpu.ops.poisson import (  # noqa: E402, F401
    dct1_2d_matmul,
    precompute_dct_matrices,
)
