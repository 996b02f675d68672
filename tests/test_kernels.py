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


def test_fused_pair_blocks_matches_unfused():
    """fused_pair_blocks (interpret) == _pair_products_t + segment_sum on a
    real pair plan built from a synthetic problem."""
    from tpu_ba.io.synthetic import make_synthetic_problem
    from tpu_ba.jacobians import jacobian_blocks_bal
    from tpu_ba.kernels.pairblocks import fused_pair_blocks
    from tpu_ba.solver.normal import assemble
    from tpu_ba.solver.pairs import (_pair_products_t, build_pair_plan,
                                     precompute_pair_data)

    problem, _ = make_synthetic_problem(
        6, 40, obs_per_point=4, pixel_noise=0.5, seed=11,
        dtype=np.float32, pad_multiple=16)
    pairs = build_pair_plan(problem.cam_idx, problem.pt_idx, problem.n_obs,
                            6, 40, pad_multiple=128, with_kernel_plans=True)
    r, Jc, Jp = jacobian_blocks_bal(
        problem.cameras, problem.points, problem.obs_2d,
        problem.cam_idx, problem.pt_idx, problem.mask)
    B = assemble(r, Jc, Jp, problem.cam_idx, problem.pt_idx, 6, 40, 0, 1.0,
                 problem.mask)
    pd = precompute_pair_data(B, pairs)
    dc = B.U.shape[-1]
    for lam in [1e-6, 1e-2, 1e2]:
        vals = _pair_products_t(pd.packed, jnp.float32(lam), dc, 1e-6, 1e32)
        import jax

        ref = jax.ops.segment_sum(vals.T, pairs.pair_seg, pairs.k_pad,
                                  indices_are_sorted=True).T
        out = fused_pair_blocks(pd.packed, pairs.pair_seg, jnp.float32(lam),
                                pairs.k_pad, pairs.seg_plan, dc=dc,
                                diag_floor=1e-6, diag_ceil=1e32,
                                interpret=True)
        # atol covers f32 cancellation noise on near-zero block entries
        # (values span ~1e6; 2/10k entries land ~1e-3 apart)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=1e-2)


@pytest.mark.parametrize("robust", [0, 1, 2, 3])
def test_fused_linearize_assemble_matches_oracle(robust):
    """fused Pallas linearize+assemble (interpret) == analytic J + assemble,
    including IRLS weighting, mask handling, and the robust cost."""
    from tpu_ba.io.synthetic import make_synthetic_problem
    from tpu_ba.jacobians import jacobian_blocks_bal
    from tpu_ba.kernels.linearize import fused_linearize_assemble
    from tpu_ba.solver.normal import assemble
    from tpu_ba.solver.plans import build_plans, pt_segsum_t

    problem, _ = make_synthetic_problem(
        6, 40, obs_per_point=4, pixel_noise=0.5, seed=12,
        dtype=np.float32, pad_multiple=128)
    C, P = 6, 40
    plans = build_plans(problem.cam_idx, problem.pt_idx, C, P, tile=128)

    r, Jc, Jp = jacobian_blocks_bal(
        problem.cameras, problem.points, problem.obs_2d,
        problem.cam_idx, problem.pt_idx, problem.mask)
    B = assemble(r, Jc, Jp, problem.cam_idx, problem.pt_idx, C, P,
                 robust, 2.0, problem.mask)

    U, gc, W, pt_vals = fused_linearize_assemble(
        problem.cameras, problem.points, problem.obs_2d,
        problem.cam_idx, problem.pt_idx, problem.mask, plans.cam_plan,
        robust_kind=robust, robust_scale=2.0, interpret=True)
    ptp = pt_segsum_t(None, pt_vals[:12], problem.pt_idx, P)
    cost = 0.5 * float(jnp.sum(pt_vals[12]))

    # rtol/atol cover f32 summation-order noise (entries span ~1e5)
    np.testing.assert_allclose(np.asarray(U), np.asarray(B.U),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(B.gc),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(W), np.asarray(B.W),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(ptp[:9]), np.asarray(B.V),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(np.asarray(ptp[9:12]), np.asarray(B.gp),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_allclose(cost, float(B.cost), rtol=1e-5)


def test_fused_linearize_small_angle():
    """θ→0 cameras go through the Taylor branch without NaNs and match the
    oracle."""
    from tpu_ba.jacobians import jacobian_blocks_bal
    from tpu_ba.kernels.linearize import fused_linearize_assemble
    from tpu_ba.solver.normal import assemble
    from tpu_ba.solver.plans import build_plans

    rng = np.random.default_rng(3)
    C, P, O = 2, 8, 128
    cams = np.zeros((C, 9), np.float32)
    cams[:, 0:3] = 1e-9                      # tiny rotation
    cams[:, 5] = -20.0
    cams[:, 6] = 300.0
    pts = rng.standard_normal((P, 3)).astype(np.float32)
    ci = np.sort(rng.integers(0, C, O)).astype(np.int32)
    pi = rng.integers(0, P, O).astype(np.int32)
    obs = rng.standard_normal((O, 2)).astype(np.float32)
    mask = np.ones(O, bool)
    plans = build_plans(ci, pi, C, P, tile=128)

    r, Jc, Jp = jacobian_blocks_bal(jnp.asarray(cams), jnp.asarray(pts),
                                    jnp.asarray(obs), jnp.asarray(ci),
                                    jnp.asarray(pi), jnp.asarray(mask))
    B = assemble(r, Jc, Jp, jnp.asarray(ci), jnp.asarray(pi), C, P, 0, 1.0,
                 jnp.asarray(mask))
    U, gc, W, pt_vals = fused_linearize_assemble(
        jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(obs),
        jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(mask), plans.cam_plan,
        interpret=True)
    assert np.isfinite(np.asarray(U)).all()
    np.testing.assert_allclose(np.asarray(W), np.asarray(B.W),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(U), np.asarray(B.U),
                               rtol=1e-4, atol=1e-3)


def _banded_f32_system(seed=0, n_cams=24, n_pts=160):
    """f32 system + fully banded symmetric pair plan (≤32 camera offsets)."""
    from tpu_ba.io.synthetic import make_synthetic_problem
    from tpu_ba.jacobians import jacobian_blocks_bal
    from tpu_ba.solver.normal import assemble
    from tpu_ba.solver.pairs import build_pair_plan

    problem, _ = make_synthetic_problem(
        n_cams, n_pts, obs_per_point=3, pixel_noise=0.5,
        seed=seed, dtype=np.float32, pad_multiple=16)
    r, Jc, Jp = jacobian_blocks_bal(
        problem.cameras, problem.points, problem.obs_2d,
        problem.cam_idx, problem.pt_idx, problem.mask)
    B = assemble(r, Jc, Jp, problem.cam_idx, problem.pt_idx,
                 n_cams, n_pts, 0, 1.0, problem.mask)
    pairs = build_pair_plan(
        problem.cam_idx, problem.pt_idx, problem.n_obs,
        n_cams, n_pts, pad_multiple=16, symmetric=True, banded=True)
    return problem, B, pairs


def test_pcg_banded_kernel_matches_jnp_pcg():
    """The VMEM-resident PCG kernel (interpret mode) reproduces the jnp
    pcg + make_banded_matvec solve: same solution, iteration count, ok."""
    from tpu_ba.kernels.pcg_band import pcg_banded
    from tpu_ba.solver.batched_linalg import inv_spd_small
    from tpu_ba.solver.normal import damp_blocks
    from tpu_ba.solver.pairs import (_compact_blocks, make_banded_matvec,
                                     precompute_pair_data)
    from tpu_ba.solver.pcg import pcg
    from tpu_ba.solver.schur import inv3x3_rows, schur_rhs

    problem, B, pairs = _banded_f32_system()
    assert pairs.banded and pairs.n_segments <= pairs.k_band  # fully banded
    lam = 1e-3
    pd = precompute_pair_data(B, pairs)
    blk = _compact_blocks(B, lam, pairs, pd, 1e-6, 1e32)
    Ul, Vl = damp_blocks(B, lam, 1e-6, 1e32)
    dc = 9
    C = pairs.n_cameras
    diag_T = blk[:, :C]
    diag_S = Ul - diag_T.reshape(dc, dc, C).transpose(2, 0, 1)
    Minv = inv_spd_small(diag_S)
    b = schur_rhs(B, inv3x3_rows(Vl))

    matvec = make_banded_matvec(blk, Ul, pairs, dc)
    x_ref, it_ref, ok_ref = pcg(
        matvec, b, lambda r: jnp.einsum("cij,cj->ci", Minv, r),
        max_iters=200, tol=1e-4)
    x_k, it_k, ok_k = pcg_banded(blk, Ul, Minv, b, pairs,
                                 max_iters=200, tol=1e-4, interpret=True)
    assert bool(ok_k) == bool(ok_ref)
    # both solves converge (not budget-capped) in a consistent iteration
    # count — f32 CG trajectories diverge chaotically near the tolerance, so
    # allow ~20% count slack; the residual contract below is the real check
    assert int(it_ref) < 200 and int(it_k) < 200
    assert abs(int(it_k) - int(it_ref)) <= max(3, int(it_ref) // 5)
    # the kernel's solution satisfies the SAME residual contract, measured
    # with the jnp matvec (f32 reduction-order differences make elementwise
    # comparison of CG iterates too brittle — the contract is the residual)
    rnorm = float(jnp.linalg.norm(b - matvec(x_k)))
    bnorm = float(jnp.linalg.norm(b))
    assert rnorm <= 2e-4 * bnorm
    # solution agreement is only well-posed where S is well-conditioned —
    # at λ=1e-3 two valid 1e-4-residual solutions can differ by ~λ_min⁻¹·tol
    # in L2 — so compare solutions at heavy damping, where CG converges in a
    # few iterations and the solve is stable
    blk2 = _compact_blocks(B, jnp.float32(1.0), pairs, pd, 1e-6, 1e32)
    Ul2, Vl2 = damp_blocks(B, 1.0, 1e-6, 1e32)
    diag2 = Ul2 - blk2[:, :C].reshape(dc, dc, C).transpose(2, 0, 1)
    Minv2 = inv_spd_small(diag2)
    b2 = schur_rhs(B, inv3x3_rows(Vl2))
    mv2 = make_banded_matvec(blk2, Ul2, pairs, dc)
    x2_ref, _, _ = pcg(mv2, b2, lambda r: jnp.einsum("cij,cj->ci", Minv2, r),
                       max_iters=200, tol=1e-6)
    x2_k, _, ok2 = pcg_banded(blk2, Ul2, Minv2, b2, pairs,
                              max_iters=200, tol=1e-6, interpret=True)
    assert bool(ok2)
    dx = float(jnp.linalg.norm(x2_k - x2_ref)) / float(jnp.linalg.norm(x2_ref))
    assert dx < 1e-3


def test_pcg_banded_kernel_warm_start_and_early_exit():
    from tpu_ba.kernels.pcg_band import pcg_banded
    from tpu_ba.solver.batched_linalg import inv_spd_small
    from tpu_ba.solver.normal import damp_blocks
    from tpu_ba.solver.pairs import _compact_blocks, precompute_pair_data
    from tpu_ba.solver.schur import inv3x3_rows, schur_rhs

    problem, B, pairs = _banded_f32_system(seed=2)
    lam = 1e-2
    pd = precompute_pair_data(B, pairs)
    blk = _compact_blocks(B, lam, pairs, pd, 1e-6, 1e32)
    Ul, Vl = damp_blocks(B, lam, 1e-6, 1e32)
    dc = 9
    C = pairs.n_cameras
    diag_S = Ul - blk[:, :C].reshape(dc, dc, C).transpose(2, 0, 1)
    Minv = inv_spd_small(diag_S)
    b = schur_rhs(B, inv3x3_rows(Vl))

    x1, it1, ok1 = pcg_banded(blk, Ul, Minv, b, pairs,
                              max_iters=60, tol=1e-4, interpret=True)
    assert bool(ok1) and int(it1) < 60
    # warm start from the converged solution: ~no further iterations
    x2, it2, ok2 = pcg_banded(blk, Ul, Minv, b, pairs,
                              max_iters=60, tol=1e-4, x0=x1, interpret=True)
    assert int(it2) <= max(int(it1) // 4, 2)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1),
                               rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("robust", [0, 1, 2, 3])
def test_fused_cost_matches_oracle(robust):
    """fused_cost (interpret) == residuals_bal + robust_rho, incl. masks
    and tile padding."""
    from tpu_ba.io.synthetic import make_synthetic_problem
    from tpu_ba.kernels.linearize import fused_cost
    from tpu_ba.residuals.reprojection import residuals_bal
    from tpu_ba.residuals.robust import robust_rho

    problem, _ = make_synthetic_problem(
        6, 40, obs_per_point=4, pixel_noise=0.5, seed=15,
        dtype=np.float32, pad_multiple=128)    # O=256: NOT a tile multiple
    r = residuals_bal(problem.cameras, problem.points, problem.obs_2d,
                      problem.cam_idx, problem.pt_idx, problem.mask)
    s = jnp.sum(r * r, axis=-1)
    rho = robust_rho(robust, s, 2.0)
    ref = 0.5 * float(jnp.sum(jnp.where(problem.mask, rho, 0.0)))
    out = float(fused_cost(problem.cameras, problem.points, problem.obs_2d,
                           problem.cam_idx, problem.pt_idx, problem.mask,
                           robust_kind=robust, robust_scale=2.0,
                           interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_pcg_banded_kernel_tridiag_precond():
    """The kernel's PCR block-tridiagonal preconditioner (interpret mode):
    same residual contract as block-Jacobi but in FEWER CG iterations, and
    kernel == jnp PCR path."""
    from tpu_ba.kernels.pcg_band import pcg_banded
    from tpu_ba.solver.batched_linalg import inv_spd_small
    from tpu_ba.solver.normal import damp_blocks
    from tpu_ba.solver.pairs import (_compact_blocks, make_banded_matvec,
                                     precompute_pair_data)
    from tpu_ba.solver.pcg import pcg
    from tpu_ba.solver.schur import inv3x3_rows, schur_rhs
    from tpu_ba.io.bal import make_bal_like_problem
    from tpu_ba.jacobians.analytic import jacobian_blocks_bal
    from tpu_ba.solver.normal import assemble
    from tpu_ba.solver.pairs import build_pair_plan
    from tpu_ba.solver.tridiag import (pcr_apply, pcr_factor,
                                       tridiag_from_band)

    # a REAL trajectory-style band: the tridiagonal part of S is PD there
    # (measured eig_min ≈ +15 at λ=1e-4); the random ring system of
    # _banded_f32_system has an INDEFINITE tridiagonal part — that case is
    # covered by the rz ≤ 0 breakdown guard, not by this test
    problem, _ = make_bal_like_problem("ladybug-49", dtype=np.float32)
    r_, Jc_, Jp_ = jacobian_blocks_bal(
        problem.cameras, problem.points, problem.obs_2d,
        problem.cam_idx, problem.pt_idx, problem.mask)
    C_, P_ = problem.cameras.shape[0], problem.points.shape[0]
    B = assemble(r_, Jc_, Jp_, problem.cam_idx, problem.pt_idx,
                 C_, P_, 0, 1.0, problem.mask)
    pairs = build_pair_plan(
        np.asarray(problem.cam_idx), np.asarray(problem.pt_idx),
        problem.n_obs, C_, P_, symmetric=True, banded=True)
    assert len(pairs.band_offsets) > 1 and pairs.band_offsets[1] == 1
    lam = 1e-3
    pd = precompute_pair_data(B, pairs)
    blk = _compact_blocks(B, lam, pairs, pd, 1e-6, 1e32)
    Ul, Vl = damp_blocks(B, lam, 1e-6, 1e32)
    dc = 9
    C = pairs.n_cameras
    diag_S = Ul - blk[:, :C].reshape(dc, dc, C).transpose(2, 0, 1)
    Minv = inv_spd_small(diag_S)
    b = schur_rhs(B, inv3x3_rows(Vl))
    matvec = make_banded_matvec(blk, Ul, pairs, dc)

    D_t, B_up = tridiag_from_band(blk, diag_S, pairs, dc)
    pcr = pcr_factor(D_t, B_up)

    x_j, it_j, ok_j = pcg(
        matvec, b, lambda r: jnp.einsum("cij,cj->ci", Minv, r),
        max_iters=300, tol=1e-5)
    x_t, it_t, ok_t = pcg(
        matvec, b, lambda r: pcr_apply(*pcr, r), max_iters=300, tol=1e-5)
    x_k, it_k, ok_k = pcg_banded(blk, Ul, Minv, b, pairs,
                                 max_iters=300, tol=1e-5, interpret=True,
                                 tridiag=pcr)
    assert bool(ok_j) and bool(ok_t) and bool(ok_k)
    # preconditioner quality: tridiag strictly cuts the CG count
    assert int(it_t) < int(it_j), (int(it_t), int(it_j))
    # kernel PCR == jnp PCR (same preconditioner, same trajectory class)
    assert abs(int(it_k) - int(it_t)) <= max(3, int(it_t) // 5)
    rnorm = float(jnp.linalg.norm(b - matvec(x_k)))
    assert rnorm <= 2e-5 * float(jnp.linalg.norm(b)) * 10
