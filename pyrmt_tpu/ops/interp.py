"""Grid interpolation (bilinear / bicubic Catmull-Rom) as vectorised gathers.

Capability parity with pyRMT/interpolators.py:4-154, including the two
robustness contracts pinned by the reference tests
(tests/test_interp_extrap_energy.py:67-81):

  * non-finite query coordinates yield NaN (never a crash), and
  * huge-but-finite coordinates are clamped BEFORE the float->int conversion.

TPU-first design: one vectorised gather of the 4 (bilinear) / 16 (bicubic)
stencil corners for ALL query points at once. ``gather_bilinear_multi``
amortises a single departure-point computation over many advected fields —
something the reference cannot do (it re-runs the full backtrace per field).
"""
from __future__ import annotations

import jax.numpy as jnp


def _prepare_queries(xq, yq, dx, dy, Nx, Ny):
    x = xq / dx
    y = yq / dy
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    # Clamp BEFORE the int cast: huge finite values would make the float->int
    # conversion undefined (reference guards the same way,
    # pyRMT/interpolators.py:31-42).
    x = jnp.clip(jnp.where(finite, x, 0.0), 0.0, Nx - 1.0)
    y = jnp.clip(jnp.where(finite, y, 0.0), 0.0, Ny - 1.0)
    return x, y, finite


def bilinear_interpolate(u, xq, yq, dx, dy, Nx=None, Ny=None):
    """Bilinear interpolation of ``u`` (Ny, Nx) at physical points (xq, yq).

    Parity: pyRMT/interpolators.py:4-62. Nx/Ny arguments accepted for
    signature compatibility; they are derived from ``u`` when omitted.
    """
    Ny_, Nx_ = u.shape
    out = gather_bilinear_multi(u[None], xq, yq, dx, dy)[0]
    del Nx, Ny, Nx_, Ny_
    return out


def gather_bilinear_multi(us, xq, yq, dx, dy):
    """Bilinearly interpolate a STACK of fields ``us`` (K, Ny, Nx) at the same
    query points. Indices and weights are computed once and shared.
    """
    K, Ny, Nx = us.shape
    x, y, finite = _prepare_queries(xq, yq, dx, dy, Nx, Ny)

    ix = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Nx - 2)
    iy = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, Ny - 2)
    fx = (x - ix).astype(us.dtype)
    fy = (y - iy).astype(us.dtype)

    v00 = us[:, iy, ix]
    v10 = us[:, iy, ix + 1]
    v01 = us[:, iy + 1, ix]
    v11 = us[:, iy + 1, ix + 1]

    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = fx * (1.0 - fy)
    w01 = (1.0 - fx) * fy
    w11 = fx * fy
    out = w00 * v00 + w10 * v10 + w01 * v01 + w11 * v11
    return jnp.where(finite, out, jnp.nan)


def cubic_convolution(v0, v1, v2, v3, t):
    """Catmull-Rom cubic along one axis (pyRMT/interpolators.py:143-154)."""
    a0 = -0.5 * v0 + 1.5 * v1 - 1.5 * v2 + 0.5 * v3
    a1 = v0 - 2.5 * v1 + 2.0 * v2 - 0.5 * v3
    a2 = -0.5 * v0 + 0.5 * v2
    return ((a0 * t + a1) * t + a2) * t + v1


def bicubic_interpolate(u, xq, yq, dx, dy, Nx=None, Ny=None):
    """Bicubic (Catmull-Rom) interpolation with clamped 4x4 stencil and
    overshoot suppression: the result is clamped to the stencil min/max
    exactly as the reference does (pyRMT/interpolators.py:136-139).
    """
    Ny_, Nx_ = u.shape
    del Nx, Ny
    Nx, Ny = Nx_, Ny_
    x, y, finite = _prepare_queries(xq, yq, dx, dy, Nx, Ny)

    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = (x - ix).astype(u.dtype)
    fy = (y - iy).astype(u.dtype)

    # 4x4 stencil with per-point index clamping (reference clamps each global
    # index into range rather than shifting the whole stencil).
    rows = []
    local_min = jnp.full_like(fx, jnp.inf)
    local_max = jnp.full_like(fx, -jnp.inf)
    for m in range(4):
        yg = jnp.clip(iy - 1 + m, 0, Ny - 1)
        cols = []
        for n in range(4):
            xg = jnp.clip(ix - 1 + n, 0, Nx - 1)
            v = u[yg, xg]
            cols.append(v)
            local_min = jnp.minimum(local_min, v)
            local_max = jnp.maximum(local_max, v)
        rows.append(cubic_convolution(cols[0], cols[1], cols[2], cols[3], fx))

    out = cubic_convolution(rows[0], rows[1], rows[2], rows[3], fy)
    out = jnp.clip(out, local_min, local_max)
    return jnp.where(finite, out, jnp.nan)
