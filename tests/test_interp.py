"""Interpolators: exactness on linears + non-finite/huge coordinate guards.

Mirrors tests/test_interp_extrap_energy.py:10-31,67-81 in the reference.
"""
import numpy as np

from pyrmt_tpu.grid import create_grid
from pyrmt_tpu.ops.interp import (
    bicubic_interpolate,
    bilinear_interpolate,
    gather_bilinear_multi,
)


def test_bilinear_exact_on_linear_field():
    N = 33
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X, Y = np.asarray(X), np.asarray(Y)
    u = 2.0 * X + 3.0 * Y
    xq = X[1:-1, 1:-1] + 0.3 * dx
    yq = Y[1:-1, 1:-1] + 0.2 * dy
    out = np.asarray(bilinear_interpolate(u, xq, yq, dx, dy))
    exact = 2.0 * xq + 3.0 * yq
    assert np.allclose(out, exact, atol=1e-10)


def test_bicubic_exact_on_linear_field():
    N = 33
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X, Y = np.asarray(X), np.asarray(Y)
    u = 2.0 * X - 1.5 * Y
    xq = X[2:-2, 2:-2] + 0.4 * dx
    yq = Y[2:-2, 2:-2] - 0.1 * dy
    out = np.asarray(bicubic_interpolate(u, xq, yq, dx, dy))
    exact = 2.0 * xq - 1.5 * yq
    assert np.allclose(out, exact, atol=1e-9)


def test_bicubic_clamps_overshoot_to_stencil_bounds():
    """Catmull-Rom overshoot near a jump must be clamped to the stencil
    min/max (pyRMT/interpolators.py:136-139)."""
    N = 33
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X = np.asarray(X)
    u = (X > 0.5).astype(np.float64)  # step
    xq = np.full((5, 5), 0.5 + 0.4 * dx)
    yq = np.full((5, 5), 0.5)
    out = np.asarray(bicubic_interpolate(u, xq, yq, dx, dy))
    assert out.min() >= 0.0 - 1e-12 and out.max() <= 1.0 + 1e-12


def test_interpolators_handle_nonfinite_coords():
    """Non-finite query coordinates must yield NaN; huge finite values are
    clamped (never an out-of-bounds access)."""
    N = 33
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X, Y = np.asarray(X), np.asarray(Y)
    u = 2.0 * X + 3.0 * Y
    xq = X.copy()
    yq = Y.copy()
    xq[0, 0] = np.nan
    yq[1, 1] = np.inf
    xq[2, 2] = -np.inf
    xq[3, 3] = 1e200
    yq[4, 4] = -1e200
    for interp in (bilinear_interpolate, bicubic_interpolate):
        out = np.asarray(interp(u, xq, yq, dx, dy))
        assert np.isnan(out[0, 0]) and np.isnan(out[1, 1]) and np.isnan(out[2, 2])
        assert np.all(np.isfinite(out[5:, 5:]))
        assert np.isfinite(out[3, 3]) and np.isfinite(out[4, 4])


def test_gather_bilinear_multi_matches_single():
    N = 33
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X, Y = np.asarray(X), np.asarray(Y)
    u1 = np.sin(2 * np.pi * X) * Y
    u2 = np.cos(np.pi * Y) + X**2
    xq = X + 0.37 * dx
    yq = Y - 0.21 * dy
    stacked = np.asarray(gather_bilinear_multi(np.stack([u1, u2]), xq, yq, dx, dy))
    s1 = np.asarray(bilinear_interpolate(u1, xq, yq, dx, dy))
    s2 = np.asarray(bilinear_interpolate(u2, xq, yq, dx, dy))
    assert np.allclose(stacked[0], s1, atol=1e-14)
    assert np.allclose(stacked[1], s2, atol=1e-14)
