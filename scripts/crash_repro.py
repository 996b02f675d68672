#!/usr/bin/env python
"""Minimal repro for the TPU worker crash seen when the fused pair kernel
runs inside the LM while_loop (solver_compare r2c)."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ba.io.bal import make_bal_like_problem
from tpu_ba.jacobians.analytic import jacobian_blocks_bal
from tpu_ba.solver import pairs as pairs_mod
from tpu_ba.solver.normal import assemble

ap = argparse.ArgumentParser()
ap.add_argument("--problem", default="ladybug-49")
ap.add_argument("--mode", default="while", choices=["call", "fori", "while", "lm"])
ap.add_argument("-n", type=int, default=30)
args = ap.parse_args()

problem, _ = make_bal_like_problem(args.problem, dtype=np.float32)
C, P = problem.n_cameras, problem.n_points
pairs = pairs_mod.build_pair_plan(problem.cam_idx, problem.pt_idx,
                                  problem.n_obs, C, P, with_kernel_plans=True)
r, Jc, Jp = jax.jit(lambda c, p: jacobian_blocks_bal(
    c, p, problem.obs_2d, problem.cam_idx, problem.pt_idx, problem.mask))(
    problem.cameras, problem.points)
B = jax.jit(lambda r, Jc, Jp: assemble(
    r, Jc, Jp, problem.cam_idx, problem.pt_idx, C, P, 0, 1.0, problem.mask))(
    r, Jc, Jp)
pd = jax.jit(lambda B: pairs_mod.precompute_pair_data(B, pairs))(B)

print("mode", args.mode, flush=True)
if args.mode == "call":
    fn = jax.jit(lambda pd, lam: pairs_mod._compact_blocks(
        B, lam, pairs, pd, 1e-6, 1e32))
    for i in range(args.n):
        out = fn(pd, jnp.float32(1e-4 + i * 1e-6))
        print(i, float(out[0, 0]), flush=True)
elif args.mode == "fori":
    @jax.jit
    def run(pd, lam0):
        def body(i, acc):
            blk = pairs_mod._compact_blocks(B, lam0 + acc * 0.0, pairs, pd,
                                            1e-6, 1e32)
            return acc + blk[0, 0] * 1e-30
        return jax.lax.fori_loop(0, args.n, body, jnp.float32(0.0))
    print(float(run(pd, jnp.float32(1e-4))), flush=True)
elif args.mode == "while":
    @jax.jit
    def run(pd, lam0):
        def cond(s):
            return s[0] < args.n
        def body(s):
            i, acc, lam = s
            blk = pairs_mod._compact_blocks(B, lam, pairs, pd, 1e-6, 1e32)
            return (i + 1, acc + blk[0, 0] * 1e-30, lam * 1.5)
        return jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0),
                                               lam0))
    out = run(pd, jnp.float32(1e-4))
    print(float(out[1]), flush=True)
elif args.mode == "lm":
    from tpu_ba.core import LMConfig
    from tpu_ba.solver.lm import solve
    cfg = LMConfig(max_iters=10, linear_solver="schur_sparse_pallas",
                   cg_max_iters=50, cg_tol=1e-2)
    t0 = time.time()
    res = solve(problem, cfg)
    print("cost", float(res.cost), "wall", time.time() - t0, flush=True)
print("OK", flush=True)
