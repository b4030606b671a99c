"""Solid Cauchy stress sanity checks (neo-Hookean from the reference map).

Same contracts/tolerances as the reference's tests/test_stress.py.
"""
import numpy as np

from pyrmt_tpu.grid import create_grid
from pyrmt_tpu.ops.stress import smoothed_heaviside, solid_cauchy_stress


def _disc_phi(X, Y, R=0.25):
    return np.sqrt((X - 0.5) ** 2 + (Y - 0.5) ** 2) - R


def _mk(N):
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    return np.asarray(X), np.asarray(Y), dx, dy


def test_undeformed_identity_zero_shear_J_one():
    N = 65
    X, Y, dx, dy = _mk(N)
    phi = _disc_phi(X, Y)
    sxx, sxy, syy, J = solid_cauchy_stress(X, Y, dx, dy, mu_s=1.0, kappa=0.0, phi=phi)
    sxx, sxy, syy, J = map(np.asarray, (sxx, sxy, syy, J))
    solid = phi <= 0
    assert np.allclose(sxx[solid], 1.0, atol=1e-6)
    assert np.allclose(syy[solid], 1.0, atol=1e-6)
    assert np.allclose(sxy[solid], 0.0, atol=1e-6)
    assert np.allclose(J[solid], 1.0, atol=1e-6)


def test_rigid_translation_unchanged_stress():
    N = 65
    X, Y, dx, dy = _mk(N)
    phi = _disc_phi(X, Y)
    sxx, sxy, syy, J = solid_cauchy_stress(X - 0.1, Y + 0.05, dx, dy, 1.0, 0.0, phi)
    sxx, sxy, J = map(np.asarray, (sxx, sxy, J))
    solid = phi <= 0
    assert np.allclose(J[solid], 1.0, atol=1e-6)
    assert np.allclose(sxx[solid], 1.0, atol=1e-6)
    assert np.allclose(sxy[solid], 0.0, atol=1e-6)


def test_uniform_stretch_known_stress():
    N = 81
    X, Y, dx, dy = _mk(N)
    phi = _disc_phi(X, Y)
    lam = 1.5
    sxx, sxy, syy, J = solid_cauchy_stress(
        X / lam, Y.copy(), dx, dy, mu_s=2.0, kappa=0.0, phi=phi)
    sxx, sxy, syy, J = map(np.asarray, (sxx, sxy, syy, J))
    solid = phi <= 0
    assert np.allclose(J[solid], lam, atol=1e-6)
    assert np.allclose(sxx[solid], 2.0 * lam**2, atol=1e-6)
    assert np.allclose(syy[solid], 2.0, atol=1e-6)
    assert np.allclose(sxy[solid], 0.0, atol=1e-6)


def test_detg_clamp_bounds_J():
    N = 49
    X, Y, dx, dy = _mk(N)
    phi = _disc_phi(X, Y)
    _, _, _, J = solid_cauchy_stress(
        10.0 * X, Y.copy(), dx, dy, 1.0, 0.0, phi, w_cut=2 * dx, detg_clamp=3.0)
    J = np.asarray(J)
    solid = phi <= 0
    assert J[solid].min() >= 1.0 / 3.0 - 1e-9
    assert J[solid].max() <= 3.0 + 1e-9


def test_volumetric_term_with_kappa():
    """kappa*(J-1) enters the diagonal: stretch lam=1.5 with kappa=3 adds
    3*(1.5-1) = 1.5 to sxx and syy."""
    N = 81
    X, Y, dx, dy = _mk(N)
    phi = _disc_phi(X, Y)
    lam = 1.5
    sxx, sxy, syy, J = solid_cauchy_stress(
        X / lam, Y.copy(), dx, dy, mu_s=2.0, kappa=3.0, phi=phi)
    sxx, syy = np.asarray(sxx), np.asarray(syy)
    solid = phi <= 0
    assert np.allclose(sxx[solid], 2.0 * lam**2 + 3.0 * (lam - 1.0), atol=1e-6)
    assert np.allclose(syy[solid], 2.0 + 3.0 * (lam - 1.0), atol=1e-6)


def test_smoothed_heaviside_limits_and_midpoint():
    w_t = 0.1
    x = np.array([-1.0, -0.1, 0.0, 0.1, 1.0])
    H = np.asarray(smoothed_heaviside(x, w_t))
    assert H[0] == 0.0 and H[-1] == 1.0
    assert abs(H[2] - 0.5) < 1e-12
    assert abs(H[1]) < 1e-12 and abs(H[3] - 1.0) < 1e-12
