"""End-to-end sim tests: pure-fluid + FSI step, checkpoint/resume, divergence
predicate, narrow-band check."""
import numpy as np
import pytest

import jax.numpy as jnp

from pyrmt_tpu.bcs import free_slip_box_bc, make_lid_bc
from pyrmt_tpu.grid import Grid
from pyrmt_tpu.sim import (
    RMTConfig,
    check_narrow_band,
    diverged,
    make_init_state,
    make_step,
)


def _disc_phi(x0, y0, R):
    def phi_init(Xq, Yq):
        return jnp.sqrt((Xq - x0) ** 2 + (Yq - y0) ** 2) - R

    return phi_init


def test_pure_fluid_step_advances_time_and_stays_finite():
    g = Grid(Nx=33, Ny=33, Lx=1.0, Ly=1.0)
    cfg = RMTConfig(grid=g, mu_f=0.01, rho_f=1.0, CFL=0.2, dt_min_cap=1e-2)
    bc = make_lid_bc(1.0)
    step = make_step(cfg, bc, (), dtype=jnp.float64)
    state = make_init_state(cfg, (), dtype=jnp.float64)
    s2, aux = step(state, jnp.asarray(10.0))
    assert float(s2.t) > 0
    assert int(s2.step) == 1
    assert not bool(diverged(s2))
    # lid BC active after the step
    assert np.allclose(np.asarray(s2.u)[-1, 1:-1], 1.0)


def test_fsi_step_mass_and_reference_map_sane():
    g = Grid(Nx=49, Ny=49, Lx=1.0, Ly=1.0)
    cfg = RMTConfig(grid=g, mu_s=0.1, eta_s=0.01, mu_f=0.01, rho_f=1.0,
                    rho_s=1.0, CFL=0.2, dt_min_cap=1e-3)
    phi_init = _disc_phi(0.5, 0.5, 0.2)
    step = make_step(cfg, free_slip_box_bc, (phi_init,), dtype=jnp.float64)
    state = make_init_state(cfg, (phi_init,), dtype=jnp.float64)
    area0 = float(jnp.sum(phi_init(state.X1[0], state.X2[0]) <= 0))
    for _ in range(5):
        state, aux = step(state, jnp.asarray(10.0))
    assert not bool(diverged(state))
    area1 = float(jnp.sum(aux["phis"][0] <= 0))
    # solid area approximately conserved over a few steps at rest
    assert abs(area1 - area0) / area0 < 0.05
    # J stays ~1 for a solid at rest
    assert abs(float(aux["J"].min()) - 1.0) < 0.05


def test_dt_clips_to_t_end():
    g = Grid(Nx=33, Ny=33, Lx=1.0, Ly=1.0)
    cfg = RMTConfig(grid=g, mu_f=0.01, rho_f=1.0, CFL=0.2, dt_min_cap=1e-2)
    step = make_step(cfg, make_lid_bc(1.0), (), dtype=jnp.float64)
    state = make_init_state(cfg, (), dtype=jnp.float64)
    t_end = jnp.asarray(1e-5)
    s2, aux = step(state, t_end)
    assert float(s2.t) <= 1e-5 + 1e-12
    s3, aux = step(s2, t_end)
    assert abs(float(s3.t) - 1e-5) < 1e-12  # dt clamps to 0 at t_end


def test_diverged_predicate():
    g = Grid(Nx=17, Ny=17, Lx=1.0, Ly=1.0)
    cfg = RMTConfig(grid=g, mu_f=0.01, rho_f=1.0)
    state = make_init_state(cfg, (), dtype=jnp.float64)
    assert not bool(diverged(state))
    bad = type(state)(u=state.u.at[3, 3].set(jnp.nan), v=state.v, p=state.p,
                      X1=state.X1, X2=state.X2, t=state.t, step=state.step)
    assert bool(diverged(bad))
    big = type(state)(u=state.u.at[3, 3].set(1e4), v=state.v, p=state.p,
                      X1=state.X1, X2=state.X2, t=state.t, step=state.step)
    assert bool(diverged(big))


def test_narrow_band_check_raises():
    with pytest.raises(ValueError):
        check_narrow_band(w_t=4 * 0.01, dx=0.01, num_layers=3)
    assert check_narrow_band(w_t=2 * 0.01, dx=0.01, num_layers=3) == 3


def test_checkpoint_roundtrip(tmp_path):
    from pyrmt_tpu.io import load_checkpoint, save_checkpoint

    g = Grid(Nx=33, Ny=33, Lx=1.0, Ly=1.0)
    cfg = RMTConfig(grid=g, mu_s=0.1, mu_f=0.01)
    phi_init = _disc_phi(0.5, 0.5, 0.2)
    step = make_step(cfg, free_slip_box_bc, (phi_init,), dtype=jnp.float64)
    state = make_init_state(cfg, (phi_init,), dtype=jnp.float64)
    state, _ = step(state, jnp.asarray(10.0))

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state)
    restored = load_checkpoint(path)
    for k in ("u", "v", "p", "X1", "X2"):
        assert np.array_equal(np.asarray(getattr(state, k)),
                              np.asarray(getattr(restored, k))), k

    # resume: stepping the restored state matches stepping the original
    s_a, _ = step(state, jnp.asarray(10.0))
    s_b, _ = step(restored, jnp.asarray(10.0))
    assert np.allclose(np.asarray(s_a.u), np.asarray(s_b.u), atol=0)


def test_snapshot_roundtrip(tmp_path):
    from pyrmt_tpu.io import load_snapshot, save_snapshot

    f = {"a": np.arange(6.0).reshape(2, 3), "b": np.ones((4,))}
    path = save_snapshot(str(tmp_path / "snap.h5"), f, attrs={"time": 1.5})
    fields, attrs = load_snapshot(path)
    assert np.array_equal(fields["a"], f["a"])
    assert abs(attrs["time"] - 1.5) < 1e-15
