"""Narrow-band extrapolation of the reference map into the fluid.

Capability parity with ``extrapolate_reference_map``
(pyRMT/functions.py:48-163): grow (X1, X2) layer-by-layer from the solid
(phi < 0) into the fluid. Each frontier cell (an unknown interior cell with a
known 3x3 neighbour) receives a Gaussian-weighted least-squares PLANE fit
a + b x + c y over the known cells in its 9x9 window, evaluated at the cell.

TPU-first re-design — the reference kernel is a serial per-cell loop with a
scalar Cramer solve; here the whole layer update becomes dense linear algebra:

  * The Gaussian weight depends only on the OFFSET (dist^2 <= r^2 with
    r = 4*sqrt(dx^2+dy^2) admits the entire 9x9 window, so the radius test is
    vacuous and the weight kernel is a fixed 9x9 array).
  * Fitting in cell-offset coordinates (a + b*di + c*dj; the value at the
    cell centre is just ``a``) makes ALL normal-equation entries fixed-kernel
    correlations of {known, known*X1, known*X2} — i.e. 2D convolutions that
    XLA maps onto the MXU. A plane fit is affine-equivariant, so the
    offset-coordinate fit returns exactly the same plane as the reference's
    absolute-coordinate fit (and is far better conditioned in float32).
  * The per-cell 3x3 solve is a branchless vectorised Cramer solve.

Known deviation (documented in SURVEY.md section 7, hard part 1): the
reference marks cells "known" sequentially WITHIN a layer, so late cells in a
sweep can see early cells of the same sweep; this update is layer-synchronous
(all frontier cells fit against the previous layer only). The band after
``max_layers`` sweeps is exactly ``max_layers`` cells wide — which is what the
narrow-band consistency check (benchmarks/common.py:70-91) requires — and the
fit is exact on linear maps either way (tests/test_interp_extrap_energy.py:33).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


_WIN = 4  # window half-width: 9x9 window, matches the reference loops


def _kernels_1d(dx, dy, dtype):
    """Separable 1D factors of the 9x9 normal-equation kernels.

    The Gaussian weight factorises exactly: w(di,dj) = wx(di) * wy(dj) with
    wx = exp(-(di dx)^2/r^2), wy = exp(-(dj dy)^2/r^2), and every moment
    kernel is an outer product of 1D factors — so each 81-tap 2D correlation
    becomes two 9-tap 1D passes (an 8x FLOP cut and a much better TPU
    layout).
    """
    offs = np.arange(-_WIN, _WIN + 1, dtype=np.float64)
    r_sq = (4.0 * np.sqrt(dx**2 + dy**2)) ** 2
    wx = np.exp(-((offs * dx) ** 2) / r_sq)
    wy = np.exp(-((offs * dy) ** 2) / r_sq)
    ones = np.ones_like(offs)
    fx = {
        "1": ones,
        "wx": wx,
        "wxd": wx * offs,
        "wxd2": wx * offs * offs,
    }
    fy = {
        "1": ones,
        "wy": wy,
        "wyd": wy * offs,
        "wyd2": wy * offs * offs,
    }
    to = lambda a: jnp.asarray(a, dtype=dtype)
    return {k: to(v) for k, v in fx.items()}, {k: to(v) for k, v in fy.items()}


def _conv1d(x_channels, taps, axis):
    """Grouped per-channel 9-tap correlation along one axis.

    x_channels: (C, Ny, Nx); taps: list of C 1D kernels (length 9).
    """
    C = x_channels.shape[0]
    lhs = x_channels[None]  # (1, C, Ny, Nx)
    k = jnp.stack(taps)     # (C, 9)
    if axis == -1:
        rhs = k[:, None, None, :]          # (C, 1, 1, 9)
        pad = [(0, 0), (_WIN, _WIN)]
    else:
        rhs = k[:, None, :, None]          # (C, 1, 9, 1)
        pad = [(_WIN, _WIN), (0, 0)]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )
    return out[0]


def _normal_equations_separable(kf, kX1, kX2, fx, fy):
    """All 13 normal-equation correlations via two grouped 1D conv passes."""
    # x pass: 8 channels = k x {1, wx, wxd, wxd2} + kX1 x {wx, wxd} + kX2 x {wx, wxd}
    xs = jnp.stack([kf, kf, kf, kf, kX1, kX1, kX2, kX2])
    xt = [fx["1"], fx["wx"], fx["wxd"], fx["wxd2"],
          fx["wx"], fx["wxd"], fx["wx"], fx["wxd"]]
    mid = _conv1d(xs, xt, axis=-1)
    (k_1, k_wx, k_wxd, k_wxd2, x1_wx, x1_wxd, x2_wx, x2_wxd) = mid

    # y pass: 13 channels
    ys = jnp.stack([
        k_1,            # count            : ones_y
        k_wx,           # S00              : wy
        k_wxd,          # S01              : wy
        k_wx,           # S02              : wyd
        k_wxd2,         # S11              : wy
        k_wxd,          # S12              : wyd
        k_wx,           # S22              : wyd2
        x1_wx,          # B1_0             : wy
        x1_wxd,         # B1_1             : wy
        x1_wx,          # B1_2             : wyd
        x2_wx,          # B2_0             : wy
        x2_wxd,         # B2_1             : wy
        x2_wx,          # B2_2             : wyd
    ])
    yt = [fy["1"], fy["wy"], fy["wy"], fy["wyd"], fy["wy"], fy["wyd"],
          fy["wyd2"], fy["wy"], fy["wy"], fy["wyd"], fy["wy"], fy["wy"],
          fy["wyd"]]
    out = _conv1d(ys, yt, axis=-2)
    return out


def _kernels(dx, dy, dtype):
    """Fixed 9x9 correlation kernels for the weighted normal equations.

    Kernel index (kj, ki) in [0, 8] corresponds to the neighbour offset
    (dj, di) = (kj - 4, ki - 4): XLA's conv is a correlation, so
    out[j, i] = sum_{dj,di} field[j+dj, i+di] * kernel[4+dj, 4+di].
    """
    offs = np.arange(-_WIN, _WIN + 1)
    DI, DJ = np.meshgrid(offs, offs)  # DI: x-offset, DJ: y-offset
    r_sq = (4.0 * np.sqrt(dx**2 + dy**2)) ** 2
    dist_sq = (DI * dx) ** 2 + (DJ * dy) ** 2
    w = np.exp(-dist_sq / r_sq)
    # the radius test dist^2 <= r^2 admits every cell of the 9x9 window
    # (max dist^2 = 16(dx^2+dy^2) == r^2), so no mask is needed.
    ones = np.ones_like(w)
    di = DI.astype(np.float64)
    dj = DJ.astype(np.float64)
    ks = np.stack(
        [
            ones,        # count
            w,           # S00
            w * di,      # S01
            w * dj,      # S02
            w * di * di, # S11
            w * di * dj, # S12
            w * dj * dj, # S22
        ]
    )
    return jnp.asarray(ks, dtype=dtype)


def _correlate(fields, kernels):
    """Correlate a (C, Ny, Nx) stack of fields with (K, 9, 9) kernels,
    producing (C, K, Ny, Nx). Zero padding reproduces the reference's
    window clipping at the domain edge (out-of-bounds cells contribute 0)."""
    C, Ny, Nx = fields.shape
    K = kernels.shape[0]
    lhs = fields[:, None, :, :]  # (C, 1, Ny, Nx) — batch=C, feature=1
    rhs = kernels[:, None, :, :]  # (K, 1, 9, 9)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=[(_WIN, _WIN), (_WIN, _WIN)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out  # (C, K, Ny, Nx)


def _interior_mask(Ny, Nx):
    jj = jnp.arange(Ny)[:, None]
    ii = jnp.arange(Nx)[None, :]
    return (jj > 0) & (jj < Ny - 1) & (ii > 0) & (ii < Nx - 1)


@partial(jax.jit, static_argnames=("dx", "dy", "max_layers"))
def extrapolate_reference_map(X1, X2, phi, dx, dy, max_layers):
    """Extrapolate (X1, X2) from the solid (phi < 0) ``max_layers`` cells into
    the fluid. Returns (X1_ext, X2_ext)."""
    dtype = X1.dtype
    Ny, Nx = X1.shape
    fx, fy = _kernels_1d(dx, dy, dtype)
    interior = _interior_mask(Ny, Nx)

    known = phi < 0.0
    X1e, X2e = X1, X2

    for _ in range(max_layers):
        kf = known.astype(dtype)
        # frontier: unknown interior cell with any known 3x3 neighbour
        # (separable 3-tap max dilation via two 1D passes)
        from pyrmt_tpu.ops.fd import _shift_x, _shift_y

        row_max = jnp.maximum(jnp.maximum(_shift_x(kf, -1), kf), _shift_x(kf, 1))
        neigh = jnp.maximum(jnp.maximum(_shift_y(row_max, -1), row_max),
                            _shift_y(row_max, 1))
        frontier = (~known) & (neigh > 0.0) & interior

        cor = _normal_equations_separable(kf, kf * X1e, kf * X2e, fx, fy)
        count = cor[0]
        a00, a01, a02 = cor[1], cor[2], cor[3]
        a11, a12, a22 = cor[4], cor[5], cor[6]
        b1_0, b1_1, b1_2 = cor[7], cor[8], cor[9]
        b2_0, b2_1, b2_2 = cor[10], cor[11], cor[12]

        from pyrmt_tpu.ops.fd import solve3x3_sym

        # offset-coordinate fit: the plane value at the centre cell is the
        # constant coefficient. det threshold in offset units (the reference's
        # 1e-10 lives in absolute-coordinate units; offset units are O(1)).
        c1_0, _, _, det, ok1 = solve3x3_sym(
            a00, a01, a02, a11, a12, a22, b1_0, b1_1, b1_2, det_eps=1e-10
        )
        c2_0, _, _, _, _ = solve3x3_sym(
            a00, a01, a02, a11, a12, a22, b2_0, b2_1, b2_2, det_eps=1e-10
        )

        accept = frontier & (count >= 3.0) & ok1
        X1e = jnp.where(accept, c1_0, X1e)
        X2e = jnp.where(accept, c2_0, X2e)
        known = known | accept

    return X1e, X2e
