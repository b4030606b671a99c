"""Multi-chip scaling: 2D spatial domain decomposition over a device mesh.

The reference has NO distributed execution of any kind (SURVEY.md section
2.3) — its only parallelism is Numba threads inside one process. The
TPU-native scaling axis for a stencil PDE code is SPATIAL domain
decomposition: shard the (Ny, Nx) grid over a 2D ``jax.sharding.Mesh`` and
jit the SAME step function with sharding annotations. XLA's SPMD partitioner
then inserts the communication automatically:

  * halo exchanges (collective-permute over ICI) for the <=4-cell stencils
    and the 9x9 extrapolation convolutions,
  * all-to-alls for the DCT/FFT Poisson transforms,
  * psums for the reductions (max|u| in the adaptive dt, means in the
    de-meaned pressure).

No NCCL/MPI translation layer exists or is needed — the mesh + shardings ARE
the communication backend.
"""
from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names=("gy", "gx")):
    """Build a near-square 2D mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    ry = int(math.sqrt(n))
    while n % ry:
        ry -= 1
    rx = n // ry
    arr = np.array(devices).reshape(ry, rx)
    return Mesh(arr, axis_names)


def state_sharding(mesh: Mesh):
    """NamedShardings for the SimState pytree: 2D fields sharded over the
    grid axes, solid stacks replicated over the (small) solid axis, scalars
    replicated."""
    gy, gx = mesh.axis_names
    field = NamedSharding(mesh, P(gy, gx))
    stack = NamedSharding(mesh, P(None, gy, gx))
    scalar = NamedSharding(mesh, P())
    from pyrmt_tpu.sim import SimState

    return SimState(u=field, v=field, p=field, X1=stack, X2=stack,
                    t=scalar, step=scalar)


def shard_state(state, mesh: Mesh):
    """Place an existing SimState onto the mesh with the canonical layout."""
    sh = state_sharding(mesh)
    return jax.tree.map(jax.device_put, state, sh)


def make_sharded_step(cfg, velocity_bc, phi_inits, mesh: Mesh, dtype=None):
    """Jit the FSI step with explicit in/out shardings over ``mesh``.

    The step body is IDENTICAL to the single-chip one — the partitioner owns
    the collectives. Returns (step_fn, shard_fn).
    """
    import dataclasses

    import jax.numpy as jnp

    from pyrmt_tpu.sim import make_step

    dtype = dtype or jnp.float32
    # Pallas kernels are single-device programs the SPMD partitioner cannot
    # split; the sharded step always uses the pure-XLA paths (which partition
    # into halo exchanges / collectives automatically).
    cfg = dataclasses.replace(
        cfg, extrap_method="xla", momentum_method="xla", rmt_method="xla",
        use_pallas_rhs=False,
    )
    base_step = make_step(cfg, velocity_bc, phi_inits, dtype=dtype)
    sh = state_sharding(mesh)
    scalar = NamedSharding(mesh, P())

    step = jax.jit(
        lambda s, t_end: base_step(s, t_end),
        in_shardings=(sh, scalar),
        out_shardings=None,  # let the partitioner propagate
    )

    def shard(state):
        return jax.tree.map(jax.device_put, state, sh)

    return step, shard
