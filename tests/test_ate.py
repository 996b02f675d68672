"""Trajectory-metric unit tests (VERDICT round 2, next #5).

Known-transform round trips: applying an arbitrary Sim(3) to a trajectory
must leave ATE ≈ 0 with the transform's scale recovered; perturbations must
surface as the injected error magnitude.
"""

import numpy as np
import jax.numpy as jnp

from tpu_ba.bench.ate import (ate_rmse, camera_centers, rpe_stats,
                              umeyama_alignment)
from tpu_ba.geometry.rotations import aa_to_matrix, matrix_to_aa


def _random_trajectory(n=40, seed=0):
    rng = np.random.default_rng(seed)
    poses = np.zeros((n, 6))
    centers = np.cumsum(rng.normal(0, 0.5, (n, 3)), axis=0)
    for i in range(n):
        aa = 0.3 * rng.standard_normal(3)
        R = np.asarray(aa_to_matrix(jnp.asarray(aa)))
        poses[i, 0:3] = aa
        poses[i, 3:6] = -R @ centers[i]
    return poses, centers


def _apply_sim3(poses, s, Rg, tg):
    """centers' = s·Rg·centers + tg expressed as new [aa, t] poses."""
    out = poses.copy()
    for i in range(poses.shape[0]):
        R = np.asarray(aa_to_matrix(jnp.asarray(poses[i, 0:3])))
        c = -R.T @ poses[i, 3:6]
        c2 = s * Rg @ c + tg
        R2 = R @ Rg.T
        out[i, 0:3] = np.asarray(matrix_to_aa(jnp.asarray(R2)))
        out[i, 3:6] = -R2 @ c2
    return out


def test_camera_centers_roundtrip():
    poses, centers = _random_trajectory()
    np.testing.assert_allclose(camera_centers(poses), centers,
                               rtol=1e-6, atol=1e-8)


def test_umeyama_recovers_known_transform():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((30, 3))
    Rg = np.asarray(aa_to_matrix(jnp.asarray([0.4, -0.2, 0.7])))
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    dst = (s_true * (Rg @ src.T)).T + t_true
    s, R, t = umeyama_alignment(src, dst)
    np.testing.assert_allclose(s, s_true, rtol=1e-10)
    np.testing.assert_allclose(R, Rg, atol=1e-10)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_ate_zero_under_sim3_gauge():
    """A Sim(3)-transformed trajectory is gauge-equivalent: ATE ≈ 0 and the
    alignment recovers the scale."""
    poses, _ = _random_trajectory(seed=2)
    Rg = np.asarray(aa_to_matrix(jnp.asarray([0.1, 0.9, -0.3])))
    est = _apply_sim3(poses, 3.0, Rg, np.array([5.0, 0.0, -2.0]))
    m = ate_rmse(est, poses)
    assert m["ate_rmse"] < 1e-6, m
    np.testing.assert_allclose(m["align_scale"], 1.0 / 3.0, rtol=1e-6)


def test_ate_measures_injected_noise():
    poses, centers = _random_trajectory(seed=3)
    rng = np.random.default_rng(4)
    noisy = poses.copy()
    sigma = 0.05
    for i in range(poses.shape[0]):
        R = np.asarray(aa_to_matrix(jnp.asarray(poses[i, 0:3])))
        c = centers[i] + rng.normal(0, sigma, 3)
        noisy[i, 3:6] = -R @ c
    m = ate_rmse(noisy, poses)
    # RMSE of isotropic 3-D noise ≈ sigma·sqrt(3); alignment removes a bit
    assert 0.3 * sigma * np.sqrt(3) < m["ate_rmse"] < 1.5 * sigma * np.sqrt(3), m


def test_rpe_zero_on_identical_trajectories():
    poses, _ = _random_trajectory(seed=5)
    m = rpe_stats(poses, poses)
    assert m["rpe_mean"] < 1e-12


def test_ate_respects_mask():
    poses, centers = _random_trajectory(seed=6)
    bad = poses.copy()
    bad[7, 3:6] += 100.0            # one corrupted frame
    mask = np.ones(poses.shape[0], bool)
    mask[7] = False
    m = ate_rmse(bad, poses, mask=mask)
    assert m["ate_rmse"] < 1e-6
    assert m["frames"] == poses.shape[0] - 1
