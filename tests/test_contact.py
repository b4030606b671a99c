"""Solid-solid contact force: repulsion direction and locality.

Same contracts as the reference's tests/test_contact.py (the two-solid
momentum-step smoke test lives in test_physics.py).
"""
import numpy as np

from pyrmt_tpu.grid import create_grid
from pyrmt_tpu.ops.contact import compute_contact_force


def _disc(X, Y, x0, y0, R):
    return np.sqrt((X - x0) ** 2 + (Y - y0) ** 2) - R


def test_contact_force_direction_is_repulsive():
    N = 161
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X, Y = np.asarray(X), np.asarray(Y)
    R = 0.105
    phi1 = _disc(X, Y, 0.40, 0.5, R)
    phi2 = _disc(X, Y, 0.60, 0.5, R)
    w_c = 4 * dx
    fx, fy = compute_contact_force(phi1, phi2, k_rep=1.0, w_c=w_c, dx=dx, dy=dy)
    fx, fy = np.asarray(fx), np.asarray(fy)

    jmid = N // 2
    xs = X[jmid, :]
    iL = np.argmin(np.abs(xs - 0.485))
    iR = np.argmin(np.abs(xs - 0.515))
    assert fx[jmid, iL] < 0.0
    assert fx[jmid, iR] > 0.0
    far = np.abs(0.5 * (phi1 - phi2)) > w_c
    assert np.allclose(fx[far], 0.0) and np.allclose(fy[far], 0.0)


def test_contact_force_zero_when_far_apart():
    N = 121
    X, Y, dx, dy = create_grid(N, N, 1.0, 1.0, dtype=np.float64)
    X, Y = np.asarray(X), np.asarray(Y)
    R = 0.12
    phi1 = _disc(X, Y, 0.25, 0.5, R)
    phi2 = _disc(X, Y, 0.75, 0.5, R)
    fx, fy = compute_contact_force(phi1, phi2, k_rep=1.0, w_c=2 * dx, dx=dx, dy=dy)
    assert np.allclose(np.asarray(fx), 0.0) and np.allclose(np.asarray(fy), 0.0)
