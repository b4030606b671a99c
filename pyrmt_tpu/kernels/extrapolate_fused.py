"""Pallas TPU kernel: the ENTIRE narrow-band extrapolation in one pass.

The XLA path (pyrmt_tpu/ops/extrapolate.py) runs ``max_layers`` sweeps, each
materialising ~21 intermediate normal-equation maps in HBM. This kernel keeps
one row-tile of the three live fields (known mask, X1, X2) resident in VMEM
and runs ALL sweeps back-to-back on it — HBM traffic drops from ~60 array
round-trips to read-3 + write-2.

Validity argument for fusing sweeps across a tiled grid: updating one cell in
sweep l needs rows within +-4 of it from sweep l-1 (the 9x9 LSQ window; the
3x3 frontier dilation is inside that radius). With a halo of H = 4*max_layers
rows on each side of the tile, the tile interior is exact after max_layers
in-block sweeps — block-edge rows go progressively stale but are never
written out. Halo rows come from the neighbouring row blocks (same stacked
input passed with block indices i-1 / i / i+1, clamped at the ends); rows
that fall outside the domain are masked to known=0, reproducing the XLA
path's zero-fill window clipping exactly.

Numerical parity with ops.extrapolate.extrapolate_reference_map is pinned in
tests/test_extrap.py (f64 interpret mode on CPU; the TPU f32 run is the same
program modulo dtype). Capability parity target: pyRMT/functions.py:48-163.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pyrmt_tpu.ops.extrapolate import _WIN, _kernels_1d


def _shz_x(f, k):
    """f[:, i+k] with zero fill (window clipping at the domain edge)."""
    if k == 0:
        return f
    z = jnp.zeros_like(f[:, : abs(k)])
    if k > 0:
        return jnp.concatenate([f[:, k:], z], axis=1)
    return jnp.concatenate([z, f[:, :k]], axis=1)


def _shz_y(f, k):
    if k == 0:
        return f
    z = jnp.zeros_like(f[: abs(k), :])
    if k > 0:
        return jnp.concatenate([f[k:, :], z], axis=0)
    return jnp.concatenate([z, f[:k, :]], axis=0)


def _corr_x(f, taps_list):
    """Correlate with several 9-tap x-kernels sharing the 9 shifted reads."""
    accs = [None] * len(taps_list)
    for k in range(-_WIN, _WIN + 1):
        s = _shz_x(f, k)
        for m, taps in enumerate(taps_list):
            w = float(taps[k + _WIN])
            if w == 0.0:
                continue
            term = s * w if w != 1.0 else s
            accs[m] = term if accs[m] is None else accs[m] + term
    return accs


def _corr_y(f, taps_list):
    accs = [None] * len(taps_list)
    for k in range(-_WIN, _WIN + 1):
        s = _shz_y(f, k)
        for m, taps in enumerate(taps_list):
            w = float(taps[k + _WIN])
            if w == 0.0:
                continue
            term = s * w if w != 1.0 else s
            accs[m] = term if accs[m] is None else accs[m] + term
    return accs


def _fit_const_coeff(a00, a01, a02, a11, a12, a22, b0, b1, b2, det_eps):
    """Constant coefficient of the weighted plane fit (Cramer), plus the
    |det| > eps acceptance mask (same contract as fd.solve3x3_sym)."""
    det = (
        a00 * (a11 * a22 - a12 * a12)
        - a01 * (a01 * a22 - a12 * a02)
        + a02 * (a01 * a12 - a11 * a02)
    )
    ok = jnp.abs(det) > det_eps
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    c0 = (
        b0 * (a11 * a22 - a12 * a12)
        - a01 * (b1 * a22 - a12 * b2)
        + a02 * (b1 * a12 - a11 * b2)
    ) * inv_det
    return jnp.where(ok, c0, 0.0), ok


def _make_kernel(fx, fy, Ny, Nx, tile, halo, max_layers):
    def kernel(prev_ref, cur_ref, next_ref, out_x1_ref, out_x2_ref):
        t = pl.program_id(0)
        top = prev_ref[:, tile - halo :, :]
        bot = next_ref[:, :halo, :]
        F = jnp.concatenate([top, cur_ref[...], bot], axis=1)
        kf0, X1b, X2b = F[0], F[1], F[2]

        rows = tile + 2 * halo
        grow = (
            t * tile - halo + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        )
        gcol = jax.lax.broadcasted_iota(jnp.int32, (1, Nx), 1)
        valid = (grow >= 0) & (grow <= Ny - 1)
        interior = (
            (grow > 0) & (grow < Ny - 1) & (gcol > 0) & (gcol < Nx - 1)
        )

        one = jnp.ones((), kf0.dtype)
        zero = jnp.zeros((), kf0.dtype)
        kf = jnp.where(valid, kf0, zero)

        for _ in range(max_layers):
            # frontier: unknown interior cell with a known 3x3 neighbour
            row_max = jnp.maximum(jnp.maximum(_shz_x(kf, -1), kf), _shz_x(kf, 1))
            neigh = jnp.maximum(
                jnp.maximum(_shz_y(row_max, -1), row_max), _shz_y(row_max, 1)
            )
            frontier = (kf == 0.0) & (neigh > 0.0) & interior

            kX1 = kf * X1b
            kX2 = kf * X2b

            # separable normal-equation correlations (offset basis — see
            # ops/extrapolate.py)
            k_1, k_wx, k_wxd, k_wxd2 = _corr_x(
                kf, [fx["1"], fx["wx"], fx["wxd"], fx["wxd2"]]
            )
            x1_wx, x1_wxd = _corr_x(kX1, [fx["wx"], fx["wxd"]])
            x2_wx, x2_wxd = _corr_x(kX2, [fx["wx"], fx["wxd"]])

            count = _corr_y(k_1, [fy["1"]])[0]
            s00, s02, s22 = _corr_y(k_wx, [fy["wy"], fy["wyd"], fy["wyd2"]])
            s01, s12 = _corr_y(k_wxd, [fy["wy"], fy["wyd"]])
            s11 = _corr_y(k_wxd2, [fy["wy"]])[0]
            b1_0, b1_2 = _corr_y(x1_wx, [fy["wy"], fy["wyd"]])
            b1_1 = _corr_y(x1_wxd, [fy["wy"]])[0]
            b2_0, b2_2 = _corr_y(x2_wx, [fy["wy"], fy["wyd"]])
            b2_1 = _corr_y(x2_wxd, [fy["wy"]])[0]

            c1_0, ok = _fit_const_coeff(
                s00, s01, s02, s11, s12, s22, b1_0, b1_1, b1_2, det_eps=1e-10
            )
            c2_0, _ = _fit_const_coeff(
                s00, s01, s02, s11, s12, s22, b2_0, b2_1, b2_2, det_eps=1e-10
            )

            accept = frontier & (count >= 3.0) & ok
            X1b = jnp.where(accept, c1_0, X1b)
            X2b = jnp.where(accept, c2_0, X2b)
            kf = jnp.where(accept, one, kf)

        out_x1_ref[...] = X1b[halo : halo + tile, :]
        out_x2_ref[...] = X2b[halo : halo + tile, :]

    return kernel


@partial(
    jax.jit, static_argnames=("dx", "dy", "max_layers", "tile", "interpret")
)
def extrapolate_reference_map_fused(
    X1, X2, phi, dx, dy, max_layers, tile=32, interpret=False
):
    """Drop-in fused replacement for ops.extrapolate.extrapolate_reference_map.

    Falls back to the XLA path when the grid does not row-tile cleanly
    (odd N such as 129) or the halo would not fit the tile.
    """
    Ny, Nx = X1.shape
    halo = 4 * max_layers
    t = min(tile, Ny)
    while t >= 8 and Ny % t:
        t //= 2
    if Ny % t or t < halo:
        from pyrmt_tpu.ops.extrapolate import extrapolate_reference_map

        return extrapolate_reference_map(X1, X2, phi, dx, dy, max_layers)

    dtype = X1.dtype
    fx, fy = _kernels_1d(dx, dy, dtype)
    kf0 = (phi < 0.0).astype(dtype)
    stacked = jnp.stack([kf0, X1.astype(dtype), X2.astype(dtype)])

    grid = (Ny // t,)
    block = pl.BlockSpec((3, t, Nx), lambda i: (0, i, 0))
    block_prev = pl.BlockSpec((3, t, Nx), lambda i: (0, jnp.maximum(i - 1, 0), 0))
    block_next = pl.BlockSpec(
        (3, t, Nx), lambda i: (0, jnp.minimum(i + 1, grid[0] - 1), 0)
    )
    out_spec = pl.BlockSpec((t, Nx), lambda i: (i, 0))

    kernel = _make_kernel(fx, fy, Ny, Nx, t, halo, max_layers)
    X1e, X2e = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block_prev, block, block_next],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((Ny, Nx), dtype),
            jax.ShapeDtypeStruct((Ny, Nx), dtype),
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(stacked, stacked, stacked)
    return X1e, X2e
