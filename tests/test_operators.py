"""Finite-difference operators: accuracy on manufactured smooth fields.

Mirrors the reference's operator contracts (tests/test_operators.py in
/root/reference) at the same tolerances, plus upwind/4th-order coverage.
"""
import numpy as np
import pytest

from pyrmt_tpu.grid import create_grid
from pyrmt_tpu.ops.fd import (
    diff_upwind_3rd,
    grad_central_x_2nd,
    grad_central_x_4th,
    grad_central_y_2nd,
    grad_central_y_4th,
    lap_2nd,
)


def _grid(N):
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    return np.asarray(X), np.asarray(Y), dx


@pytest.mark.parametrize("N", [33, 65])
def test_grad_x_interior_exact_on_linear(N):
    X, Y, h = _grid(N)
    f = 3.0 * X + 2.0 * Y
    dfdx = np.asarray(grad_central_x_2nd(f, h))
    assert np.allclose(dfdx[1:-1, 1:-1], 3.0, atol=1e-10)
    # one-sided boundary closure is also exact on linears
    assert np.allclose(dfdx, 3.0, atol=1e-10)


@pytest.mark.parametrize("N", [33, 65])
def test_grad_y_interior_exact_on_linear(N):
    X, Y, h = _grid(N)
    f = 3.0 * X + 2.0 * Y
    dfdy = np.asarray(grad_central_y_2nd(f, h))
    assert np.allclose(dfdy[1:-1, 1:-1], 2.0, atol=1e-10)
    assert np.allclose(dfdy, 2.0, atol=1e-10)


def test_grad_second_order():
    """Interior gradient error should drop ~4x when h halves (2nd order)."""
    errs = []
    for N in (33, 65):
        X, Y, h = _grid(N)
        f = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        exact = 2 * np.pi * np.cos(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        num = np.asarray(grad_central_x_2nd(f, h))
        errs.append(np.max(np.abs((num - exact)[2:-2, 2:-2])))
    order = np.log(errs[0] / errs[1]) / np.log(2)
    assert order > 1.8


def test_grad_fourth_order():
    """4th-order interior gradient error drops ~16x when h halves."""
    errs = []
    for N in (33, 65):
        X, Y, h = _grid(N)
        f = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        exact = 2 * np.pi * np.cos(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        for g, e in ((grad_central_x_4th, exact),):
            num = np.asarray(g(f, h))
            errs.append(np.max(np.abs((num - e)[3:-3, 3:-3])))
    order = np.log(errs[0] / errs[1]) / np.log(2)
    assert order > 3.5


def test_grad_y_4th_exact_on_cubic():
    X, Y, h = _grid(41)
    f = Y**3
    dfdy = np.asarray(grad_central_y_4th(f, h))
    assert np.allclose(dfdy[3:-3, :], 3.0 * Y[3:-3, :] ** 2, atol=1e-9)


def test_laplacian_zero_on_harmonic_quadratic():
    """lap(x^2 - y^2) = 0; 2nd-order central differences are exact for quadratics."""
    X, Y, h = _grid(65)
    f = X**2 - Y**2
    lap = np.asarray(lap_2nd(f, h, h))
    assert np.max(np.abs(lap[1:-1, 1:-1])) < 1e-9


def test_laplacian_second_order_on_sine():
    errs = []
    for N in (33, 65):
        X, Y, h = _grid(N)
        f = np.sin(np.pi * X) * np.sin(np.pi * Y)
        exact = -2.0 * np.pi**2 * f
        lap = np.asarray(lap_2nd(f, h, h))
        errs.append(np.max(np.abs((lap - exact)[2:-2, 2:-2])))
    order = np.log(errs[0] / errs[1]) / np.log(2)
    assert order > 1.8


def test_upwind_3rd_exact_on_linear_and_sign_switch():
    """3rd-order upwind is exact on linear fields for both wind signs, and the
    boundary fallback matches 1st-order upwind semantics."""
    X, Y, h = _grid(33)
    f = 2.0 * X + 1.0
    for sgn in (+1.0, -1.0):
        u = sgn * np.ones_like(f)
        d = np.asarray(diff_upwind_3rd(f, u, h, axis=1))
        assert np.allclose(d, 2.0, atol=1e-10)
    g = -1.5 * Y
    for sgn in (+1.0, -1.0):
        u = sgn * np.ones_like(g)
        d = np.asarray(diff_upwind_3rd(g, u, h, axis=0))
        assert np.allclose(d, -1.5, atol=1e-10)


def test_upwind_3rd_third_order_interior():
    errs = []
    for N in (65, 129):
        X, Y, h = _grid(N)
        f = np.sin(2 * np.pi * X)
        u = np.ones_like(f)
        exact = 2 * np.pi * np.cos(2 * np.pi * X)
        d = np.asarray(diff_upwind_3rd(f, u, h, axis=1))
        errs.append(np.max(np.abs((d - exact)[:, 3:-3])))
    order = np.log(errs[0] / errs[1]) / np.log(2)
    assert order > 2.7
