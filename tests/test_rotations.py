import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ba.geometry import (
    aa_to_matrix,
    matrix_to_aa,
    aa_to_quat,
    quat_to_aa,
    quat_to_matrix,
    rotate_aa,
)
from tpu_ba.geometry.rotations import matrix_to_quat


def _rand_aa(key, n, scale=2.0):
    # direction × magnitude, magnitude kept below pi so angle-axis round-trips
    # are identity (beyond pi the canonical representative differs)
    v = jax.random.normal(key, (n, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    mag = jax.random.uniform(jax.random.fold_in(key, 1), (n, 1), minval=1e-6, maxval=3.0)
    return v * mag * (scale / 2.0)


def test_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    aa = _rand_aa(key, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    R = aa_to_matrix(aa)
    np.testing.assert_allclose(
        rotate_aa(aa, x), jnp.einsum("nij,nj->ni", R, x), atol=1e-12
    )


def test_rotate_small_angle_and_zero():
    x = jnp.array([[1.0, 2.0, 3.0]])
    for eps in [0.0, 1e-9, 1e-7, 1e-4]:
        aa = jnp.array([[eps, 0.0, 0.0]])
        R = aa_to_matrix(aa)
        np.testing.assert_allclose(
            rotate_aa(aa, x), jnp.einsum("nij,nj->ni", R, x), atol=1e-12
        )
    # gradient is finite at exactly zero
    g = jax.grad(lambda a: jnp.sum(rotate_aa(a, x[0])))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_aa_quat_roundtrip():
    key = jax.random.PRNGKey(2)
    aa = _rand_aa(key, 128)
    np.testing.assert_allclose(quat_to_aa(aa_to_quat(aa)), aa, atol=1e-9)


def test_aa_matrix_roundtrip():
    key = jax.random.PRNGKey(3)
    aa = _rand_aa(key, 128)
    np.testing.assert_allclose(matrix_to_aa(aa_to_matrix(aa)), aa, atol=1e-8)


def test_quat_matrix_consistency():
    key = jax.random.PRNGKey(4)
    aa = _rand_aa(key, 64)
    np.testing.assert_allclose(
        quat_to_matrix(aa_to_quat(aa)), aa_to_matrix(aa), atol=1e-10
    )
    q = matrix_to_quat(aa_to_matrix(aa))
    q2 = aa_to_quat(aa)
    # sign-invariant comparison
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q * sign, q2, atol=1e-9)


def test_rotation_orthonormal():
    key = jax.random.PRNGKey(5)
    R = aa_to_matrix(_rand_aa(key, 32))
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=1e-12)


@pytest.mark.parametrize("angle", [np.pi - 1e-3, np.pi - 1e-6])
def test_near_pi(angle):
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    aa = jnp.asarray(angle * axis)[None]
    aa_rt = matrix_to_aa(aa_to_matrix(aa))
    np.testing.assert_allclose(aa_rt, aa, atol=1e-6)
