"""Advection schemes: accuracy on smooth profiles + banding semantics."""
import numpy as np

from pyrmt_tpu.grid import create_grid
from pyrmt_tpu.ops.advect import (
    advect_central2_rk3,
    advect_reference_map,
    advect_reference_map_multi,
    advect_semilagrangian_rk4,
    advect_weno5_rk3,
    weno5_rhs,
)


def _setup(N):
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    return np.asarray(X), np.asarray(Y), dx, dy


def test_semilagrangian_translates_gaussian():
    """Constant velocity: the semi-Lagrangian solution is the translated
    initial condition (up to bilinear smoothing)."""
    N = 129
    X, Y, dx, dy = _setup(N)
    q = np.exp(-((X - 0.4) ** 2 + (Y - 0.5) ** 2) / 0.01)
    a = np.full_like(q, 0.5)
    b = np.zeros_like(q)
    dt = 0.02
    qn = np.asarray(advect_semilagrangian_rk4(q, a, b, X, Y, dt, dx, dy))
    exact = np.exp(-((X - 0.4 - 0.5 * dt) ** 2 + (Y - 0.5) ** 2) / 0.01)
    err = np.max(np.abs(qn - exact)[5:-5, 5:-5])
    assert err < 2e-3


def test_weno5_rhs_exact_on_linear():
    """WENO5 recovers -(u*qx + v*qy) exactly for a linear field."""
    N = 65
    X, Y, dx, dy = _setup(N)
    q = 2.0 * X - 0.7 * Y
    a = 0.3 * np.ones_like(q)
    b = -0.4 * np.ones_like(q)
    phi = -np.ones_like(q)  # everywhere active
    rhs = np.asarray(weno5_rhs(q, a, b, dx, dy, phi, 0.0))
    expected = -(0.3 * 2.0 + (-0.4) * (-0.7))
    assert np.allclose(rhs[3:-3, 3:-3], expected, atol=1e-10)


def test_weno5_banding_leaves_outside_zero():
    N = 65
    X, Y, dx, dy = _setup(N)
    q = np.sin(2 * np.pi * X)
    a = np.ones_like(q)
    b = np.ones_like(q)
    phi = np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2) - 0.2
    rhs = np.asarray(weno5_rhs(q, a, b, dx, dy, phi, 0.0))
    assert np.allclose(rhs[phi > 0], 0.0)
    assert np.max(np.abs(rhs[phi <= 0])) > 0.0


def test_central2_translates_smooth_profile():
    """Many small SSP-RK3 steps of central2 track a translating Gaussian."""
    N = 129
    X, Y, dx, dy = _setup(N)
    q = np.exp(-((X - 0.4) ** 2 + (Y - 0.5) ** 2) / 0.02)
    a = np.full_like(q, 1.0)
    b = np.zeros_like(q)
    phi = -np.ones_like(q)
    dt = 0.2 * dx
    qn = q
    steps = 16
    for _ in range(steps):
        qn = advect_central2_rk3(qn, a, b, dx, dy, dt, phi, 0.0)
    qn = np.asarray(qn)
    shift = steps * dt
    exact = np.exp(-((X - 0.4 - shift) ** 2 + (Y - 0.5) ** 2) / 0.02)
    err = np.max(np.abs(qn - exact)[5:-5, 5:-5])
    assert err < 5e-3


def test_weno5_translates_smooth_profile_accurately():
    N = 129
    X, Y, dx, dy = _setup(N)
    q = np.exp(-((X - 0.4) ** 2 + (Y - 0.5) ** 2) / 0.02)
    a = np.full_like(q, 1.0)
    b = np.zeros_like(q)
    phi = -np.ones_like(q)
    dt = 0.2 * dx
    qn = q
    steps = 16
    for _ in range(steps):
        qn = advect_weno5_rk3(qn, a, b, dx, dy, dt, phi, 0.0)
    qn = np.asarray(qn)
    shift = steps * dt
    exact = np.exp(-((X - 0.4 - shift) ** 2 + (Y - 0.5) ** 2) / 0.02)
    err = np.max(np.abs(qn - exact)[5:-5, 5:-5])
    assert err < 1e-3


def test_dispatcher_multi_matches_single():
    N = 65
    X, Y, dx, dy = _setup(N)
    q1 = np.sin(2 * np.pi * X) * Y
    q2 = np.cos(np.pi * Y) * X
    a = 0.2 + 0.1 * np.sin(2 * np.pi * Y)
    b = -0.3 * np.cos(np.pi * X)
    phi = -np.ones_like(q1)
    dt = 0.3 * dx
    for scheme in ("semilagrangian", "central2", "weno5"):
        multi = np.asarray(
            advect_reference_map_multi(
                np.stack([q1, q2]), a, b, X, Y, dt, dx, dy, phi, scheme, 0.0
            )
        )
        s1 = np.asarray(
            advect_reference_map(q1, a, b, X, Y, dt, dx, dy, phi, scheme, 0.0)
        )
        s2 = np.asarray(
            advect_reference_map(q2, a, b, X, Y, dt, dx, dy, phi, scheme, 0.0)
        )
        assert np.allclose(multi[0], s1, atol=1e-13), scheme
        assert np.allclose(multi[1], s2, atol=1e-13), scheme


def test_dispatcher_unknown_scheme_raises():
    import pytest

    N = 17
    X, Y, dx, dy = _setup(N)
    q = np.zeros((N, N))
    with pytest.raises(ValueError):
        advect_reference_map(q, q, q, X, Y, 0.1, dx, dy, q, "bogus", 0.0)


def test_local_semilagrangian_matches_gather_path():
    """The gather-free local bilinear path must match the general gather
    path bit-for-tolerance when the displacement is sub-cell."""
    import jax.numpy as jnp

    from pyrmt_tpu.ops.advect import (
        advect_semilagrangian_rk4_local,
        advect_semilagrangian_rk4_multi,
    )

    N = 65
    X, Y, dx, dy = _setup(N)
    rng = np.random.default_rng(7)
    q1 = np.sin(2 * np.pi * X) * Y
    q2 = np.cos(np.pi * Y) * X**2
    a = 0.3 * np.sin(2 * np.pi * Y) + 0.1
    b = -0.25 * np.cos(np.pi * X)
    dt = 0.5 * dx  # |u| < 0.4 => displacement < 0.2 cells
    qs = jnp.stack([jnp.asarray(q1), jnp.asarray(q2)])
    ref = np.asarray(advect_semilagrangian_rk4_multi(
        qs, jnp.asarray(a), jnp.asarray(b), jnp.asarray(X), jnp.asarray(Y),
        dt, dx, dy))
    loc = np.asarray(advect_semilagrangian_rk4_local(
        qs, jnp.asarray(a), jnp.asarray(b), dt, dx, dy))
    assert np.allclose(loc, ref, atol=1e-11)


def test_local_bilinear_matches_gather_bilinear():
    """gather_bilinear_local == gather_bilinear_multi for sub-cell
    displacements, including at the domain boundary."""
    import jax.numpy as jnp

    from pyrmt_tpu.ops.interp import gather_bilinear_local, gather_bilinear_multi

    N = 33
    X, Y, dx, dy = _setup(N)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((N, N))
    sx = rng.uniform(-0.95, 0.95, (N, N))
    sy = rng.uniform(-0.95, 0.95, (N, N))
    xq = X + sx * dx
    yq = Y + sy * dy
    ref = np.asarray(gather_bilinear_multi(
        jnp.asarray(u)[None], jnp.asarray(xq), jnp.asarray(yq), dx, dy))[0]
    loc = np.asarray(gather_bilinear_local(
        jnp.asarray(u)[None], jnp.asarray(sx), jnp.asarray(sy)))[0]
    assert np.allclose(loc, ref, atol=1e-12)
