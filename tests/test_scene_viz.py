"""Scene save/load round-trips (.npz and .mat) and headless plotting."""

import os

import numpy as np

from tpu_ba.io.scene import load_scene, save_scene
from tpu_ba.io.synthetic import make_synthetic_problem


def _problem():
    problem, _ = make_synthetic_problem(
        4, 40, obs_per_point=3, pixel_noise=0.5, seed=0,
        dtype=np.float64, pad_multiple=8)
    return problem


def test_scene_roundtrip_npz(tmp_path):
    p = _problem()
    path = str(tmp_path / "scene.npz")
    save_scene(path, p)
    q = load_scene(path, dtype=np.float64, pad_multiple=8)
    np.testing.assert_allclose(q.cameras, p.cameras)
    np.testing.assert_allclose(q.points, p.points)
    assert q.n_obs == p.n_obs
    # observations match up to the (camera-sorted) ordering both use
    np.testing.assert_allclose(np.asarray(q.obs_2d)[:q.n_obs],
                               np.asarray(p.obs_2d)[:p.n_obs])
    np.testing.assert_array_equal(np.asarray(q.cam_idx)[:q.n_obs],
                                  np.asarray(p.cam_idx)[:p.n_obs])


def test_scene_roundtrip_mat(tmp_path):
    p = _problem()
    path = str(tmp_path / "scene.mat")
    save_scene(path, p)
    q = load_scene(path, dtype=np.float64, pad_multiple=8)
    np.testing.assert_allclose(q.cameras, p.cameras)
    np.testing.assert_allclose(q.points, p.points)
    assert q.n_obs == p.n_obs
    assert q.model == p.model


def test_plots_render(tmp_path):
    from tpu_ba.core import LMConfig
    from tpu_ba.solver.lm import solve
    from tpu_ba.viz import plot_convergence, plot_reprojection, plot_scene

    p = _problem()
    res = solve(p, LMConfig(max_iters=5, linear_solver="schur_pcg",
                            cg_max_iters=50, cg_tol=1e-8))
    s = plot_scene(res.cameras, res.points, str(tmp_path / "scene.png"))
    c = plot_convergence(res, str(tmp_path / "conv.png"))
    r = plot_reprojection(p, res.cameras, res.points, str(tmp_path / "repr.png"))
    for f in (s, c, r):
        assert os.path.exists(f) and os.path.getsize(f) > 1000
