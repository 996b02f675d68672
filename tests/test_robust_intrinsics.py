"""BASELINE config 3: robust kernels + radial-distortion intrinsics
refinement (Trafalgar-class problem with outliers)."""

import numpy as np

from tpu_ba.core import LMConfig
from tpu_ba.io.bal import make_bal_like_problem
from tpu_ba.io.synthetic import make_synthetic_problem
from tpu_ba.residuals.robust import ROBUST_CAUCHY, ROBUST_HUBER
from tpu_ba.solver.lm import solve


def test_intrinsics_refinement_recovers_focal():
    """Perturbed focal lengths + zeroed distortion are re-estimated."""
    problem, gt = make_synthetic_problem(
        12, 150, obs_per_point=5, pixel_noise=0.2, seed=21,
        intrinsics_perturb=0.05, k1=-1e-2, k2=1e-4,
        dtype=np.float64, pad_multiple=64,
    )
    res = solve(problem, LMConfig(max_iters=40, cg_max_iters=300, cg_tol=1e-12))
    f_est = np.asarray(res.cameras)[:, 6]
    f_gt = gt["cameras"][:, 6]
    rel = np.abs(f_est - f_gt) / f_gt
    assert np.median(rel) < 0.01, rel
    rmse = np.sqrt(2 * float(res.cost) / gt["n_obs"])
    assert rmse < 0.4


def test_trafalgar_standin_robust_with_outliers():
    """Small trafalgar-style run: Huber and Cauchy tolerate 5% gross
    outliers; non-robust does measurably worse on inlier RMSE."""
    problem, gt = make_synthetic_problem(
        15, 200, obs_per_point=5, pixel_noise=0.3, seed=22,
        dtype=np.float64, pad_multiple=64,
    )
    # inject outliers manually
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    obs = np.array(problem.obs_2d)
    n_out = int(0.05 * gt["n_obs"])
    idx = rng.choice(gt["n_obs"], n_out, replace=False)
    obs[idx] += rng.normal(0, 40.0, (n_out, 2))
    problem = dataclasses.replace(problem, obs_2d=jnp.asarray(obs))

    inlier = np.ones(problem.obs_2d.shape[0], bool)
    inlier[idx] = False
    inlier &= np.asarray(problem.mask)

    def inlier_rmse(res):
        from tpu_ba.residuals.reprojection import residuals_bal

        r = residuals_bal(res.cameras, res.points, problem.obs_2d,
                          problem.cam_idx, problem.pt_idx, problem.mask)
        r = np.asarray(r)[inlier]
        return float(np.sqrt(np.mean(np.sum(r * r, axis=1))))

    results = {}
    for name, kind in [("none", 0), ("huber", ROBUST_HUBER),
                       ("cauchy", ROBUST_CAUCHY)]:
        cfg = LMConfig(max_iters=30, robust_kind=kind, robust_scale=1.0,
                       cg_max_iters=200, cg_tol=1e-10)
        results[name] = inlier_rmse(solve(problem, cfg))
    assert results["huber"] < 0.6, results
    assert results["cauchy"] < 0.6, results
    assert results["none"] > 1.5 * results["huber"], results


def test_trafalgar_dims_generator():
    problem, gt = make_bal_like_problem(
        "trafalgar-257", pixel_noise=1.0, outlier_frac=0.02,
        intrinsics_perturb=0.03, dtype=np.float32)
    assert problem.n_cameras == 257
    assert problem.n_points == 65132
    assert gt["n_obs"] == 225911
