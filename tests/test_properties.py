"""Property-based tests (SURVEY.md §4.6): robust kernels vs closed forms,
observation-permutation invariance, gauge invariance under hypothesis."""

import dataclasses

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from tpu_ba.residuals.robust import (
    ROBUST_ARCTAN, ROBUST_CAUCHY, ROBUST_HUBER, robust_rho, robust_weight)


@given(st.floats(1e-6, 1e6), st.floats(0.1, 10.0))
@settings(max_examples=50, deadline=None)
def test_robust_rho_derivative(s, a):
    """ρ'(s) (the IRLS weight) matches the numerical derivative of ρ."""
    for kind in (ROBUST_HUBER, ROBUST_CAUCHY, ROBUST_ARCTAN):
        eps = max(s * 1e-6, 1e-9)
        num = (float(robust_rho(kind, jnp.float64(s + eps), a))
               - float(robust_rho(kind, jnp.float64(s - eps), a))) / (2 * eps)
        w = float(robust_weight(kind, jnp.float64(s), a))
        assert abs(num - w) < 1e-4 * max(1.0, abs(w)), (kind, s, a, num, w)


@given(st.floats(0.0, 1e8))
@settings(max_examples=30, deadline=None)
def test_robust_rho_properties(s):
    """ρ(s) ≤ s (never amplifies), monotone weights in [0, 1]."""
    for kind in (ROBUST_HUBER, ROBUST_CAUCHY, ROBUST_ARCTAN):
        rho = float(robust_rho(kind, jnp.float64(s), 1.5))
        w = float(robust_weight(kind, jnp.float64(s), 1.5))
        assert rho <= s + 1e-9
        assert -1e-12 <= w <= 1.0 + 1e-12


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=5, deadline=None)
def test_observation_permutation_invariance(seed):
    """Shuffling the observation list does not change the solve (the
    problem builder re-sorts; segment sums are order-independent)."""
    from tpu_ba.core import LMConfig, make_problem
    from tpu_ba.io.synthetic import make_synthetic_problem
    from tpu_ba.solver.lm import solve

    problem, gt = make_synthetic_problem(6, 50, obs_per_point=3,
                                         pixel_noise=0.4, seed=3,
                                         dtype=np.float64, pad_multiple=16)
    n = gt["n_obs"]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    shuffled = make_problem(
        np.asarray(problem.cameras), np.asarray(problem.points),
        np.asarray(problem.obs_2d[:n])[perm],
        np.asarray(problem.cam_idx[:n])[perm],
        np.asarray(problem.pt_idx[:n])[perm],
        dtype=np.float64, pad_multiple=16)
    cfg = LMConfig(max_iters=6, cg_max_iters=200, cg_tol=1e-12)
    c1 = float(solve(problem, cfg).cost)
    c2 = float(solve(shuffled, cfg).cost)
    np.testing.assert_allclose(c2, c1, rtol=1e-9)
