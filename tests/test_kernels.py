"""Pallas kernel tests (interpret mode on CPU; real lowering on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_ba.kernels.segsum import build_segsum_plan, sorted_segment_sum


def _case(O, N, D, seed=0, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # skewed segment sizes (a few huge segments)
        sizes = rng.integers(1, 10, N).astype(np.float64)
        sizes[: max(N // 50, 1)] *= 100
        p = sizes / sizes.sum()
        keys = np.sort(rng.choice(N, O, p=p)).astype(np.int32)
    else:
        keys = np.sort(rng.integers(0, N, O)).astype(np.int32)
    values = rng.standard_normal((O, D)).astype(np.float32)
    return values, keys


@pytest.mark.parametrize("O,N,D,skew", [
    (4096, 37, 12, False),       # camera-like: few dense segments
    (4096, 1500, 12, False),     # point-like: many sparse segments
    (8192, 300, 90, False),      # wide D (packed U+g)
    (4096, 1000, 3, True),       # skewed sizes, tiny D
    (2048, 5, 9, False),         # tiny N
])
def test_segsum_matches_fallback(O, N, D, skew):
    values, keys = _case(O, N, D, skew=skew)
    plan = build_segsum_plan(keys, N, tile=1024)
    ref = np.asarray(sorted_segment_sum(jnp.asarray(values), jnp.asarray(keys),
                                        N, plan=None))
    out = np.asarray(sorted_segment_sum(jnp.asarray(values), jnp.asarray(keys),
                                        N, plan=plan, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_segsum_with_empty_segments():
    # segments with no observations must come out exactly zero
    rng = np.random.default_rng(1)
    keys = np.sort(rng.choice([0, 3, 7, 19], 2048)).astype(np.int32)
    values = rng.standard_normal((2048, 8)).astype(np.float32)
    plan = build_segsum_plan(keys, 20, tile=1024)
    out = np.asarray(sorted_segment_sum(jnp.asarray(values), jnp.asarray(keys),
                                        20, plan=plan, interpret=True))
    ref = np.asarray(sorted_segment_sum(jnp.asarray(values), jnp.asarray(keys),
                                        20, plan=None))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    empty = ~np.isin(np.arange(20), keys)
    assert np.all(out[empty] == 0)


def test_plan_rejects_unsorted():
    with pytest.raises(ValueError):
        build_segsum_plan(np.array([3, 1, 2] + [4] * 1021, dtype=np.int32), 5,
                          tile=1024)


def test_pallas_solver_path_matches_segment_path():
    """linear_solver='schur_pcg_pallas' (interpret on CPU) == 'schur_pcg'."""
    import dataclasses

    from tpu_ba.core import LMConfig
    from tpu_ba.io.synthetic import make_synthetic_problem
    from tpu_ba.solver.lm import solve

    problem, _ = make_synthetic_problem(10, 100, obs_per_point=4,
                                        pixel_noise=0.5, seed=11,
                                        dtype=np.float64, pad_multiple=1024)
    cfg = LMConfig(max_iters=8, cg_max_iters=200, cg_tol=1e-12)
    res_ref = solve(problem, cfg)
    import tpu_ba.kernels.segsum as ss
    # run the pallas path through the interpreter on CPU
    orig = ss.sorted_segment_sum_t

    def interp(values_t, keys, n_out, plan=None, **kw):
        kw["interpret"] = True
        return orig(values_t, keys, n_out, plan=plan, **kw)

    ss.sorted_segment_sum_t = interp
    try:
        cfg_p = dataclasses.replace(cfg, linear_solver="schur_pcg_pallas")
        res_p = solve(problem, cfg_p)
    finally:
        ss.sorted_segment_sum_t = orig
    np.testing.assert_allclose(float(res_p.cost), float(res_ref.cost), rtol=1e-8)
    assert int(res_p.iterations) == int(res_ref.iterations)
