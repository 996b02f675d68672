#!/usr/bin/env python
"""Component-level timing of the BA hot path on the real TPU.

Measures, for a given problem size:
  * residual+Jacobian eval
  * assembly (XLA segment_sum vs Pallas segsum)
  * one Schur/PCG matvec (both paths)
  * full linear solve
so optimization effort goes where the time actually is.
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="ladybug-49")
    ap.add_argument("--cache", default="/tmp/ba_prob_cache")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()

    import os

    os.makedirs(args.cache, exist_ok=True)
    cpath = os.path.join(args.cache, args.problem + ".npz")
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
    from tpu_ba.solver.normal import assemble
    from tpu_ba.solver import schur as schur_mod
    from tpu_ba.solver.plans import build_plans

    C = problem.cameras.shape[0]
    P = problem.points.shape[0]
    O = problem.obs_2d.shape[0]
    print(f"{args.problem}: C={C} P={P} O={O}")

    plans = build_plans(problem.cam_idx, problem.pt_idx, C, P)
    print(f"cam plan: chunk={plans.cam_plan.chunk} n_chunks={plans.cam_plan.n_chunks} "
          f"tile={plans.cam_plan.tile} grid={plans.cam_plan.grid}")
    print(f"pt  plan: chunk={plans.pt_plan.chunk} n_chunks={plans.pt_plan.n_chunks} "
          f"tile={plans.pt_plan.tile} grid={plans.pt_plan.grid}")

    # --- jacobian eval
    jac = jax.jit(lambda c, p: jacobian_blocks_bal(
        c, p, problem.obs_2d, problem.cam_idx, problem.pt_idx, problem.mask))
    t = timeit(jac, problem.cameras, problem.points)
    print(f"jacobian eval:           {t*1e3:8.2f} ms")

    r, Jc, Jp = jac(problem.cameras, problem.points)

    # --- assembly
    asm_xla = jax.jit(lambda r, Jc, Jp: assemble(
        r, Jc, Jp, problem.cam_idx, problem.pt_idx, C, P, 0, 1.0, problem.mask))
    t = timeit(asm_xla, r, Jc, Jp)
    print(f"assembly (XLA segsum):   {t*1e3:8.2f} ms")

    asm_pl = jax.jit(lambda r, Jc, Jp: assemble(
        r, Jc, Jp, problem.cam_idx, problem.pt_idx, C, P, 0, 1.0, problem.mask,
        None, plans))
    t = timeit(asm_pl, r, Jc, Jp)
    print(f"assembly (Pallas):       {t*1e3:8.2f} ms")

    B = asm_xla(r, Jc, Jp)
    lam = jnp.asarray(1e-4, jnp.float32)

    from tpu_ba.solver.normal import damp_blocks

    def make_mv(plans_):
        Ul, Vl = damp_blocks(B, lam, 1e-6, 1e32)
        Vinv = schur_mod.inv3x3_rows(Vl)
        mv = schur_mod.make_schur_matvec(Ul, B.W, Vinv, B.cam_idx, B.pt_idx, P,
                                         None, plans_)
        return jax.jit(mv)

    x = jnp.ones((C, B.U.shape[-1]), jnp.float32)
    mv_x = make_mv(None)
    t = timeit(mv_x, x)
    print(f"schur matvec (XLA):      {t*1e3:8.2f} ms")
    mv_p = make_mv(plans)
    t = timeit(mv_p, x)
    print(f"schur matvec (Pallas):   {t*1e3:8.2f} ms")

    # --- full linear solve (schur+pcg, 50 iters)
    for name, pl_ in (("XLA", None), ("Pallas", plans)):
        slv = jax.jit(functools.partial(
            schur_mod.solve_schur_pcg, cg_max_iters=50, cg_tol=1e-30,
            diag_floor=1e-6, diag_ceil=1e32, plans=pl_))
        t = timeit(slv, B, lam, n=5)
        print(f"linear solve 50cg ({name}): {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
