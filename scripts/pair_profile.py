#!/usr/bin/env python
"""Per-component timing of the schur_sparse(_pallas) hot path on the TPU.

The axon backend is remote: per-call timing includes result transfer through
the tunnel, so every component is timed by ITERATING INSIDE ONE JIT
(lax.fori_loop with a scalar carry that blocks DCE/hoisting) and fetching a
single scalar — the pattern .claude/skills/verify/SKILL.md prescribes.

Times, at real BAL scale: jacobian eval, assembly (XLA vs Pallas), the
per-linearization pair gather, the per-λ compact-block build (pair products
+ segment reduction, jnp vs Pallas), one CG matvec, schur rhs, cost eval —
so fused-kernel effort (VERDICT round 1, next #1/#6) goes where the time is.
"""

from __future__ import annotations

import argparse
import dataclasses
import time


def loop_time(make_body, n, *args, label=""):
    """Time n in-jit iterations of make_body(carry_scalar, *args) -> scalar."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(i, c):
            return make_body(c, *args)

        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    out = run(args)          # compile + warm
    _ = float(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(args))
        best = min(best, time.perf_counter() - t0)
    per = best / n * 1e3
    print(f"{label:32s} {per:9.2f} ms")
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="ladybug-1723")
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from tpu_ba.io.bal import make_bal_like_problem
    from tpu_ba.jacobians.analytic import jacobian_blocks_bal
    from tpu_ba.residuals.reprojection import residuals_bal
    from tpu_ba.solver import pairs as pairs_mod
    from tpu_ba.solver.normal import assemble, damp_blocks
    from tpu_ba.solver.plans import build_plans
    from tpu_ba.solver.schur import inv3x3_rows, schur_rhs

    problem, _ = make_bal_like_problem(args.problem, dtype=np.float32)
    C, P, O = problem.n_cameras, problem.n_points, problem.obs_2d.shape[0]
    print(f"{args.problem}: C={C} P={P} O={O}")

    t0 = time.time()
    plans = build_plans(problem.cam_idx, problem.pt_idx, C, P)
    pairs = pairs_mod.build_pair_plan(
        problem.cam_idx, problem.pt_idx, problem.n_obs, C, P,
        with_kernel_plans=True)
    print(f"plan build: {time.time()-t0:.1f}s  pairs={pairs.n_pairs} "
          f"K={pairs.n_segments} k_pad={pairs.k_pad} "
          f"seg_grid={pairs.seg_plan.grid} ci_grid={pairs.ci_plan.grid} "
          f"heavy_obs={pairs.n_heavy_obs}")
    pairs_jnp = pairs_mod.PairPlan(**{
        **{f.name: getattr(pairs, f.name) for f in dataclasses.fields(pairs)},
        "seg_plan": None, "ci_plan": None})

    n = args.n
    cams, pts = problem.cameras, problem.points
    obs, ci, pi, mask = problem.obs_2d, problem.cam_idx, problem.pt_idx, problem.mask

    # jacobian: perturb cams by carry*0 so the loop can't be hoisted
    def jac_body(c, cams, pts):
        r, Jc, Jp = jacobian_blocks_bal(cams + c * 0.0, pts, obs, ci, pi, mask)
        return c + r[0, 0] * 0.0 + Jc[0, 0, 0] * 1e-30

    loop_time(jac_body, n, cams, pts, label="jacobian eval")

    r, Jc, Jp = jax.jit(lambda c, p: jacobian_blocks_bal(
        c, p, obs, ci, pi, mask))(cams, pts)

    for name, pl_ in (("XLA", None), ("Pallas", plans)):
        def asm_body(c, r, Jc, Jp, pl_=pl_):
            B = assemble(r + c * 0.0, Jc, Jp, ci, pi, C, P, 0, 1.0, mask,
                         None, pl_)
            return c + B.U[0, 0, 0] * 1e-30

        loop_time(asm_body, n, r, Jc, Jp, label=f"assembly ({name})")

    B = jax.jit(lambda r, Jc, Jp: assemble(
        r, Jc, Jp, ci, pi, C, P, 0, 1.0, mask))(r, Jc, Jp)

    def gather_body(c, B):
        B2 = B._replace(W=B.W + c * 0.0)
        pd = pairs_mod.precompute_pair_data(B2, pairs)
        return c + pd.packed[0, 0] * 1e-30

    gb = pairs.n_pairs * (6 * 9 + 9) * 4 / 1e9
    t = loop_time(gather_body, n, B, label=f"pair gather ({gb:.2f} GB)")
    print(f"{'':32s}  -> {gb / (t / 1e3):6.1f} GB/s")

    pd = jax.jit(lambda B: pairs_mod.precompute_pair_data(B, pairs))(B)
    lam = jnp.asarray(1e-4, jnp.float32)

    for name, pr in (("jnp", pairs_jnp), ("Pallas", pairs)):
        def blk_body(c, pd, lam, pr=pr):
            blk = pairs_mod._compact_blocks(B, lam + c * 0.0, pr, pd,
                                            1e-6, 1e32)
            return c + blk[0, 0] * 1e-30

        loop_time(blk_body, n, pd, lam, label=f"compact blocks ({name})")

    blk = jax.jit(lambda pd, lam: pairs_mod._compact_blocks(
        B, lam, pairs, pd, 1e-6, 1e32))(pd, lam)

    dc = B.U.shape[-1]
    Ul, Vl_pts = damp_blocks(B, lam, 1e-6, 1e32)
    x = jnp.ones((C, dc), jnp.float32)

    for name, pr in (("jnp", pairs_jnp), ("Pallas", pairs)):
        def mv_body(c, x, blk, pr=pr):
            from tpu_ba.kernels.segsum import sorted_segment_sum_t

            xx = x + c * 0.0
            y = jnp.einsum("cij,cj->ci", Ul, xx)
            xg = xx.T[:, pairs.seg_cj]
            z = jnp.stack([
                sum(blk[dc * i + j] * xg[j] for j in range(dc))
                for i in range(dc)])
            t_ = sorted_segment_sum_t(z, pairs.seg_ci, C + 1, plan=pr.ci_plan)
            y = y - t_[:, :C].T
            return c + y[0, 0] * 1e-30

        loop_time(mv_body, n * 4, x, blk, label=f"CG matvec ({name})")

    for name, pl_ in (("XLA", None), ("Pallas", plans)):
        def rhs_body(c, B, pl_=pl_):
            Vinv = inv3x3_rows(damp_blocks(B, lam + c * 0.0, 1e-6, 1e32)[1])
            b = schur_rhs(B, Vinv, None, pl_)
            return c + b[0, 0] * 1e-30

        loop_time(rhs_body, n, B, label=f"schur rhs ({name})")

    def cost_body(c, cams, pts):
        rr = residuals_bal(cams + c * 0.0, pts, obs, ci, pi, mask)
        return c + jnp.sum(jnp.where(mask[:, None], rr * rr, 0.0)) * 1e-30

    loop_time(cost_body, n, cams, pts, label="cost eval")


if __name__ == "__main__":
    main()
