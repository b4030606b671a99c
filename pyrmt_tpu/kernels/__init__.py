from pyrmt_tpu.kernels.momentum_rhs import velocity_rhs_blended_pallas  # noqa: F401
