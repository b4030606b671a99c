"""Driver-level checkpoint/resume (SURVEY.md section 5: resume first-class).

Kill/restart mid-run must reproduce the uninterrupted trajectory: the two
long-horizon drivers are interrupted via their ``max_chunks`` hook (which
saves the checkpoint exactly like the periodic ``ckpt_every`` path does) and
resumed with ``resume=True``; the resumed history must match the
uninterrupted run's to roundoff (identical jitted programs on identical
state → identical floats on CPU f64).
"""

import pytest

pytestmark = pytest.mark.slow  # full local tier only; fast tier = -m 'not slow'
import numpy as np


def test_capillary_driver_resume_matches_uninterrupted(tmp_path):
    from benchmarks.capillary_drop_coupled import run

    kw = dict(N=32, gamma=0.1, R=0.2, t_end=0.08, dtype="float64",
              log_every=8, verbose=False)
    _, full = run(out_root=str(tmp_path / "full"), **kw)
    rows_full = np.array([[r["t"], r["aspect"], r["area"], r["umax"]]
                          for r in _])

    part_root = str(tmp_path / "part")
    run(out_root=part_root, max_chunks=1, ckpt_every=1, **kw)
    rows2, resumed = run(out_root=part_root, resume=True, **kw)
    rows_res = np.array([[r["t"], r["aspect"], r["area"], r["umax"]]
                         for r in rows2])

    assert rows_res.shape == rows_full.shape
    np.testing.assert_allclose(rows_res, rows_full, rtol=1e-12, atol=1e-13)
    assert resumed["steps"] == full["steps"]


def test_sedimentation_driver_resume_matches_uninterrupted(tmp_path):
    from benchmarks.sedimentation_pack import run

    kw = dict(N=48, S=2, R=0.12, rho_ratio=2.0, t_end=0.03,
              dtype="float64", log_every=5, verbose=False)
    rows1, full = run(out_root=str(tmp_path / "full"), **kw)
    rows_full = np.array([[r["t"], r["dmin"], r["ke"], r["ybar"],
                           r["area_drift"]] for r in rows1])

    part_root = str(tmp_path / "part")
    run(out_root=part_root, max_chunks=1, ckpt_every=1, **kw)
    rows2, resumed = run(out_root=part_root, resume=True, **kw)
    rows_res = np.array([[r["t"], r["dmin"], r["ke"], r["ybar"],
                          r["area_drift"]] for r in rows2])

    assert rows_res.shape == rows_full.shape
    # area_drift baselines come from the persisted resume_meta.npz, so the
    # drift column must agree too
    np.testing.assert_allclose(rows_res, rows_full, rtol=1e-12, atol=1e-13)
    assert resumed["no_passthrough"] == full["no_passthrough"]
