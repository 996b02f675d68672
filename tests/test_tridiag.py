"""PCR block-tridiagonal preconditioner: oracle tests vs dense solves."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ba.solver.tridiag import (n_pcr_levels, pcr_apply, pcr_factor)


def _random_spd_tridiag(C, dc, seed=0, damp=2.0):
    """Random SPD block-tridiagonal (via G G^T of a banded G, plus damping)."""
    rng = np.random.default_rng(seed)
    D = rng.standard_normal((C, dc, dc)) * 0.3
    D = D @ D.transpose(0, 2, 1) + damp * np.eye(dc)
    B = rng.standard_normal((C, dc, dc)) * 0.25
    B[-1] = 0.0
    # symmetrize into a dense reference
    M = np.zeros((C * dc, C * dc))
    for c in range(C):
        M[c * dc:(c + 1) * dc, c * dc:(c + 1) * dc] = D[c]
        if c + 1 < C:
            M[c * dc:(c + 1) * dc, (c + 1) * dc:(c + 2) * dc] = B[c]
            M[(c + 1) * dc:(c + 2) * dc, c * dc:(c + 1) * dc] = B[c].T
    # ensure SPD of the assembled tridiagonal (diag dominance)
    ev_min = np.linalg.eigvalsh(M).min()
    if ev_min < 0.1:
        bump = (0.1 - ev_min)
        D = D + bump * np.eye(dc)
        M = M + bump * np.eye(C * dc)
    return D, B, M


@pytest.mark.parametrize("C,dc", [(5, 3), (16, 9), (23, 9), (64, 9)])
def test_pcr_exact_inverse(C, dc):
    """Full-depth PCR apply == dense solve of the tridiagonal system."""
    D, B, M = _random_spd_tridiag(C, dc, seed=C)
    r = np.random.default_rng(1).standard_normal((C, dc))
    P, Q, Dinv = pcr_factor(jnp.asarray(D), jnp.asarray(B))
    assert P.shape[0] == n_pcr_levels(C)
    z = np.asarray(pcr_apply(P, Q, Dinv, jnp.asarray(r)))
    z_ref = np.linalg.solve(M, r.reshape(-1)).reshape(C, dc)
    np.testing.assert_allclose(z, z_ref, rtol=1e-8, atol=1e-10)


def test_pcr_symmetric_operator():
    """The preconditioner is symmetric: <M^-1 u, v> == <u, M^-1 v> (CG
    requires a symmetric preconditioner)."""
    C, dc = 17, 9
    D, B, _ = _random_spd_tridiag(C, dc, seed=3)
    P, Q, Dinv = pcr_factor(jnp.asarray(D), jnp.asarray(B))
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((C, dc)))
    v = jnp.asarray(rng.standard_normal((C, dc)))
    lhs = float(jnp.sum(pcr_apply(P, Q, Dinv, u) * v))
    rhs = float(jnp.sum(u * pcr_apply(P, Q, Dinv, v)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-9)


def test_pcr_cuts_cg_iterations():
    """On a banded SPD system, tridiag-PCR preconditioning needs
    substantially fewer CG iterations than block-Jacobi."""
    from tpu_ba.solver.pcg import pcg

    C, dc = 48, 9
    rng = np.random.default_rng(7)
    # trajectory-like: strong offset-1 coupling + weaker offset-2
    D, B, _ = _random_spd_tridiag(C, dc, seed=11, damp=4.0)
    B2 = rng.standard_normal((C, dc, dc)) * 0.05
    B2[-2:] = 0.0
    Dj, Bj, B2j = jnp.asarray(D), jnp.asarray(B), jnp.asarray(B2)

    def matvec(x):
        y = jnp.einsum("cij,cj->ci", Dj, x)
        y = y.at[:-1].add(jnp.einsum("cij,cj->ci", Bj[:-1], x[1:]))
        y = y.at[1:].add(jnp.einsum("cji,cj->ci", Bj[:-1], x[:-1]))
        y = y.at[:-2].add(jnp.einsum("cij,cj->ci", B2j[:-2], x[2:]))
        y = y.at[2:].add(jnp.einsum("cji,cj->ci", B2j[:-2], x[:-2]))
        return y

    b = jnp.asarray(rng.standard_normal((C, dc)))
    from tpu_ba.solver.batched_linalg import inv_spd_small

    Minv_j = inv_spd_small(Dj)
    x_j, it_j, ok_j = pcg(matvec, b, lambda r: jnp.einsum(
        "cij,cj->ci", Minv_j, r), max_iters=500, tol=1e-10)
    P, Q, Dinv = pcr_factor(Dj, Bj)
    x_t, it_t, ok_t = pcg(matvec, b, lambda r: pcr_apply(P, Q, Dinv, r),
                          max_iters=500, tol=1e-10)
    assert bool(ok_j) and bool(ok_t)
    # same answer
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_j),
                               rtol=1e-6, atol=1e-8)
    # and materially fewer iterations
    assert int(it_t) < int(it_j), (int(it_t), int(it_j))
