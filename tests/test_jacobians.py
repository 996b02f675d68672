import jax
import jax.numpy as jnp
import numpy as np

from tpu_ba.jacobians import jacobian_blocks_bal, jacobian_blocks_bal_autodiff


def _random_scene(key, n_cams=5, n_pts=20, n_obs=60):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    aa = 0.3 * jax.random.normal(k1, (n_cams, 3))
    t = jnp.concatenate(
        [0.5 * jax.random.normal(k2, (n_cams, 2)), 4.0 + jax.random.uniform(k2, (n_cams, 1))],
        axis=-1,
    )
    intr = jnp.stack(
        [
            500.0 + 50.0 * jax.random.normal(k3, (n_cams,)),
            1e-2 * jax.random.normal(k3, (n_cams,)),
            1e-3 * jax.random.normal(k4, (n_cams,)),
        ],
        axis=-1,
    )
    cams = jnp.concatenate([aa, t, intr], axis=-1)
    # points in front of the BAL cameras (which look down -z): put them at
    # negative z in camera frame → world points near origin, cameras at +z
    pts = jax.random.normal(k4, (n_pts, 3))
    # BAL convention: t_z ≈ +4 means camera-frame z ≈ +4 > 0 ... we need
    # P_z != 0; projection divides by -z so either sign works for the math.
    cam_idx = jax.random.randint(k5, (n_obs,), 0, n_cams)
    pt_idx = jax.random.randint(k1, (n_obs,), 0, n_pts)
    obs = jax.random.normal(k2, (n_obs, 2)) * 10.0
    return cams, pts, obs, cam_idx, pt_idx


def test_analytic_matches_autodiff():
    cams, pts, obs, ci, pi = _random_scene(jax.random.PRNGKey(0))
    r1, Jc1, Jp1 = jacobian_blocks_bal(cams, pts, obs, ci, pi)
    r2, Jc2, Jp2 = jacobian_blocks_bal_autodiff(cams, pts, obs, ci, pi)
    np.testing.assert_allclose(r1, r2, atol=1e-10)
    np.testing.assert_allclose(Jc1, Jc2, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(Jp1, Jp2, rtol=1e-6, atol=1e-7)


def test_analytic_matches_autodiff_small_angles():
    cams, pts, obs, ci, pi = _random_scene(jax.random.PRNGKey(1))
    cams = cams.at[:, 0:3].multiply(1e-8)  # near-identity rotations
    r1, Jc1, Jp1 = jacobian_blocks_bal(cams, pts, obs, ci, pi)
    r2, Jc2, Jp2 = jacobian_blocks_bal_autodiff(cams, pts, obs, ci, pi)
    np.testing.assert_allclose(Jc1, Jc2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Jp1, Jp2, rtol=1e-5, atol=1e-6)


def test_mask_zeroes_rows():
    cams, pts, obs, ci, pi = _random_scene(jax.random.PRNGKey(2))
    mask = jnp.arange(obs.shape[0]) < 30
    r, Jc, Jp = jacobian_blocks_bal(cams, pts, obs, ci, pi, mask)
    # lane-major: observation axis is last
    assert np.all(np.asarray(r[:, 30:]) == 0)
    assert np.all(np.asarray(Jc[:, :, 30:]) == 0)
    assert np.all(np.asarray(Jp[:, :, 30:]) == 0)


def test_jacobian_finite_differences():
    cams, pts, obs, ci, pi = _random_scene(jax.random.PRNGKey(3), n_obs=10)
    r0, Jc, Jp = jacobian_blocks_bal(cams, pts, obs, ci, pi)
    eps = 1e-6
    # perturb camera 0 param 4 (t_y)
    d = jnp.zeros_like(cams).at[0, 4].set(eps)
    r1, _, _ = jacobian_blocks_bal(cams + d, pts, obs, ci, pi)
    fd = (r1 - r0) / eps
    pred = Jc[:, 4, :] * (np.asarray(ci) == 0)[None, :]
    np.testing.assert_allclose(fd, pred, rtol=1e-4, atol=1e-4)
