#!/usr/bin/env python
"""At-scale (ladybug-1723) timing of the schur_dense hot path.

The axon remote backend adds ~25 ms dispatch latency per jit call, so naive
per-op microbenches are meaningless at this scale; every measurement here
loops the op N times inside one jit (lax.fori_loop) and reports per-op time.

Measures, per LM iteration's constituents:
  * T4 build (pair products + pair segsum)  — once per lambda-try
  * one CG matvec: einsum on T4 vs dense (6C,6C) S matvec, f32 vs bf16
  * cost eval (residuals + reduction)
  * full solve cg_history — how many CG iterations each LM iteration used
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def timeit_loop(fn_once, n):
    """fn_once: () -> arrays; builds a jit that runs fn n times via fori.
    Reports (sec_per_op, compile_s) with compile_s = first call minus one
    steady-state run (the first call includes a full timed execution)."""
    import jax

    t0 = time.perf_counter()
    out = fn_once()
    jax.block_until_ready(out)
    first_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn_once()
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / n, max(first_s - best, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="ladybug-1723")
    ap.add_argument("--loops", type=int, default=20)
    ap.add_argument("--full-solve", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()

    import os

    cache = "/tmp/ba_prob_cache"
    os.makedirs(cache, exist_ok=True)
    cpath = os.path.join(cache, args.problem + ".npz")
    t0 = time.time()
    if os.path.exists(cpath):
        z = np.load(cpath)
        from tpu_ba.core import BAProblem

        mask = np.asarray(z["mask"])
        problem = BAProblem(
            cameras=jnp.asarray(z["cameras"]), points=jnp.asarray(z["points"]),
            obs_2d=jnp.asarray(z["obs_2d"]), cam_idx=jnp.asarray(z["cam_idx"]),
            pt_idx=jnp.asarray(z["pt_idx"]), mask=jnp.asarray(mask),
            n_cameras=int(z["cameras"].shape[0]),
            n_points=int(z["points"].shape[0]),
            n_obs=int(mask.sum()), model="bal")
    else:
        from tpu_ba.io.bal import make_bal_like_problem

        problem, _ = make_bal_like_problem(args.problem, dtype=np.float32)
        np.savez(cpath, cameras=np.asarray(problem.cameras),
                 points=np.asarray(problem.points),
                 obs_2d=np.asarray(problem.obs_2d),
                 cam_idx=np.asarray(problem.cam_idx),
                 pt_idx=np.asarray(problem.pt_idx),
                 mask=np.asarray(problem.mask))
    print(f"problem load/gen: {time.time()-t0:.1f}s")

    from tpu_ba.jacobians.analytic import jacobian_blocks_bal
    from tpu_ba.residuals.reprojection import residuals_bal
    from tpu_ba.solver import pairs as pairs_mod
    from tpu_ba.solver.normal import assemble

    C = problem.cameras.shape[0]
    P = problem.points.shape[0]
    O = problem.obs_2d.shape[0]
    print(f"{args.problem}: C={C} P={P} O={O}")

    pairs = pairs_mod.build_pair_plan(
        problem.cam_idx, problem.pt_idx, problem.n_obs, C, P)
    print(f"pairs: Np={pairs.n_pairs} max_degree={pairs.max_degree}")

    if args.full_solve:
        from tpu_ba.core import LMConfig
        from tpu_ba.solver.lm import solve

        cfg = LMConfig(max_iters=50, linear_solver="schur_dense",
                       cg_max_iters=50, cg_tol=1e-2, init_lambda=1e-4)
        t0 = time.time()
        res = solve(problem, cfg)
        _ = float(res.cost)
        print(f"solve (compile+run): {time.time()-t0:.1f}s")
        t0 = time.time()
        res = solve(problem, cfg)
        jax.block_until_ready(res)
        _ = float(res.cost)
        run_s = time.time() - t0
        print(f"solve run: {run_s:.2f}s  iters={int(res.iterations)} "
              f"accepted={int(res.accepted)} cost={float(res.cost):.6g}")
        print("cg_history:", np.asarray(res.cg_history).tolist())
        print("lam_history:", ["%.1e" % v for v in np.asarray(res.lam_history)])
        return

    n = args.loops
    lam = jnp.asarray(1e-4, jnp.float32)

    r, Jc, Jp = jax.jit(lambda c, p: jacobian_blocks_bal(
        c, p, problem.obs_2d, problem.cam_idx, problem.pt_idx, problem.mask))(
        problem.cameras, problem.points)
    B = jax.jit(lambda r, Jc, Jp: assemble(
        r, Jc, Jp, problem.cam_idx, problem.pt_idx, C, P, 0, 1.0,
        problem.mask))(r, Jc, Jp)
    pair_data = jax.jit(functools.partial(
        pairs_mod.precompute_pair_data, pairs=pairs))(B)
    jax.block_until_ready(pair_data)

    # --- residual+jacobian (the linearization, once per outer iter)
    @jax.jit
    def jac_n(cams, pts):
        def body(i, acc):
            r, Jc, Jp = jacobian_blocks_bal(
                cams + 0.0 * i, pts, problem.obs_2d, problem.cam_idx,
                problem.pt_idx, problem.mask)
            return acc + r[0, 0] + Jc[0, 0, 0] + Jp[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, 0.0)

    t, c = timeit_loop(lambda: jac_n(problem.cameras, problem.points), n)
    print(f"jacobian eval:        {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    # --- cost eval (once per lambda-try)
    @jax.jit
    def cost_n(cams, pts):
        def body(i, acc):
            r = residuals_bal(cams + 0.0 * i, pts, problem.obs_2d,
                              problem.cam_idx, problem.pt_idx, problem.mask)
            return acc + 0.5 * jnp.sum(r * r)
        return jax.lax.fori_loop(0, n, body, 0.0)

    t, c = timeit_loop(lambda: cost_n(problem.cameras, problem.points), n)
    print(f"cost eval:            {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    # --- assembly (once per outer iter)
    @jax.jit
    def asm_n(r, Jc, Jp):
        def body(i, acc):
            B = assemble(r + 0.0 * i, Jc, Jp, problem.cam_idx, problem.pt_idx,
                         C, P, 0, 1.0, problem.mask)
            return acc + B.cost + B.U[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, 0.0)

    t, c = timeit_loop(lambda: asm_n(r, Jc, Jp), n)
    print(f"assembly:             {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    # --- pair gather (once per outer iter)
    @jax.jit
    def gather_n(B):
        def body(i, acc):
            pd = pairs_mod.precompute_pair_data(
                B._replace(W=B.W + 0.0 * i), pairs)
            return acc + pd[0, 0]
        return jax.lax.fori_loop(0, n, body, 0.0)

    t, c = timeit_loop(lambda: gather_n(B), n)
    print(f"pair gather:          {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    # --- T4 build (once per lambda-try)
    @jax.jit
    def t4_n(B, pair_data):
        def body(i, acc):
            Ul, T4, dS = pairs_mod.build_schur_t(
                B, lam + 0.0 * i, pairs, pair_data, 1e-6, 1e32)
            return acc + T4[0, 0, 0, 0] + dS[0, 0, 0]
        return jax.lax.fori_loop(0, n, body, 0.0)

    t, c = timeit_loop(lambda: t4_n(B, pair_data), n)
    print(f"T4 build:             {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    Ul, T4, diag_S = jax.jit(functools.partial(
        pairs_mod.build_schur_t, diag_floor=1e-6, diag_ceil=1e32,
        pairs=pairs))(B, lam, pair_data=pair_data)
    jax.block_until_ready(T4)
    dc = Ul.shape[-1]
    x0 = jnp.ones((C, dc), jnp.float32)

    # --- CG matvec via T4 einsum (the current path; once per CG iter)
    @jax.jit
    def mv_t4_n(T4, Ul, x):
        def body(i, x):
            y = jnp.einsum("cij,cj->ci", Ul, x)
            y = y - jnp.einsum("ijcd,dj->ci", T4, x)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        return jax.lax.fori_loop(0, n, body, x)

    t, c = timeit_loop(lambda: mv_t4_n(T4, Ul, x0), n)
    print(f"matvec T4 einsum f32: {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    # --- CG matvec via dense S (reshape once, standard matvec)
    @jax.jit
    def make_S(T4, Ul):
        S4 = -T4.transpose(2, 0, 3, 1)
        idx = jnp.arange(C)
        S4 = S4.at[idx, :, idx, :].add(Ul)
        return S4.reshape(C * dc, C * dc)

    t0 = time.perf_counter()
    S = make_S(T4, Ul)
    jax.block_until_ready(S)
    tS = time.perf_counter() - t0
    t0 = time.perf_counter()
    S = make_S(T4, Ul)
    jax.block_until_ready(S)
    tS = min(tS, time.perf_counter() - t0)
    print(f"S reshape (per λ):    {tS*1e3:8.2f} ms")

    xf = jnp.ones((C * dc,), jnp.float32)

    @jax.jit
    def mv_S_n(S, x):
        def body(i, x):
            y = S @ x
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        return jax.lax.fori_loop(0, n, body, x)

    t, c = timeit_loop(lambda: mv_S_n(S, xf), n)
    print(f"matvec dense S f32:   {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    Sb = S.astype(jnp.bfloat16)

    @jax.jit
    def mv_Sb_n(Sb, x):
        def body(i, x):
            y = jnp.dot(Sb, x.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        return jax.lax.fori_loop(0, n, body, x)

    t, c = timeit_loop(lambda: mv_Sb_n(Sb, xf), n)
    print(f"matvec dense S bf16:  {t*1e3:8.2f} ms   (compile {c:.0f}s)")

    # --- matvec with 8 RHS at once (CG block potential / batched lambda)
    X8 = jnp.ones((C * dc, 8), jnp.float32)

    @jax.jit
    def mv_S8_n(S, X):
        def body(i, X):
            Y = S @ X
            return Y / jnp.maximum(jnp.max(jnp.abs(Y)), 1e-30)
        return jax.lax.fori_loop(0, n, body, X)

    t, c = timeit_loop(lambda: mv_S8_n(S, X8), n)
    print(f"matvec dense S x8rhs: {t*1e3:8.2f} ms   (compile {c:.0f}s)")


if __name__ == "__main__":
    main()
