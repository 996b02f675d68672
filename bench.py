#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json:2,5): BA iterations/second on the
Ladybug-1723-dimension BAL problem on one TPU chip, with ``vs_baseline`` the
speedup of time-per-LM-iteration against the in-repo MATLAB-class CPU
baseline (scipy Schur + dense Cholesky — see tpu_ba/bench/cpu_baseline.py).
The reference itself has no retrievable numbers (empty mount, no published
benchmarks — SURVEY.md §0/§6), so the CPU baseline is the documented
stand-in denominator, and the BAL problem is a dimension-matched synthetic
stand-in (no network egress — real BAL files load via tpu_ba.io.bal if
provided).

Detailed metrics (cost trace, time-to-1%-of-final-cost, RMSE parity vs the
fp64 CPU trajectory) are written to bench_detail.json.
"""

from __future__ import annotations

import argparse
import json
import math
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="ladybug-1723",
                    help="BAL stand-in name or 'synthetic'")
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--cg-iters", type=int, default=50)
    ap.add_argument("--cg-tol", type=float, default=1e-2)
    ap.add_argument("--baseline-iters", type=int, default=3)
    ap.add_argument("--baseline-problem", default="ladybug-49",
                    help="problem for the CPU denominator (kept small so the "
                         "bench finishes; per-iteration time is the quantity "
                         "compared, conservatively favoring the baseline)")
    ap.add_argument("--quick", action="store_true", help="small problem, few iters")
    ap.add_argument("--solver", default="schur_dense",
                    help="linear solver: schur_dense | schur_dense_pallas | "
                         "schur_pcg | schur_pcg_pallas")
    args = ap.parse_args()

    import jax

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()

    from tpu_ba.bench.cpu_baseline import solve_cpu_baseline
    from tpu_ba.core import LMConfig
    from tpu_ba.io.bal import make_bal_like_problem
    from tpu_ba.io.synthetic import make_synthetic_problem
    from tpu_ba.solver.lm import solve

    if args.quick:
        args.problem = "ladybug-49"
        args.max_iters = 20

    t0 = time.time()
    if args.problem == "synthetic":
        problem, gt = make_synthetic_problem(20, 500, dtype=np.float32)
    else:
        problem, gt = make_bal_like_problem(args.problem, dtype=np.float32)
    gen_s = time.time() - t0
    n_obs = gt["n_obs"]

    cfg = LMConfig(max_iters=args.max_iters, linear_solver=args.solver,
                   cg_max_iters=args.cg_iters, cg_tol=args.cg_tol,
                   init_lambda=1e-4)

    # compile + warm run (value fetch forces real completion: on the axon
    # remote backend block_until_ready can return before execution finishes)
    t0 = time.time()
    res = solve(problem, cfg)
    _ = float(res.cost)
    compile_s = time.time() - t0

    # timed runs (best of 3, each fully materialized)
    run_s = float("inf")
    for _trial in range(3):
        t0 = time.time()
        res = solve(problem, cfg)
        jax.block_until_ready(res)
        _ = float(res.cost)
        run_s = min(run_s, time.time() - t0)
    iters = int(res.iterations)
    iters_per_sec = iters / max(run_s, 1e-9)

    final_cost = float(res.cost)
    hist = np.asarray(res.cost_history, np.float64)
    rmse = math.sqrt(2.0 * final_cost / n_obs)

    # time-to-1%-of-final-cost (BASELINE.json:2): first iteration whose cost
    # is within 1% of the final cost, scaled by measured sec/iter
    target = final_cost * 1.01
    reach = int(np.argmax(hist <= target)) + 1
    time_to_1pct_s = reach * run_s / max(iters, 1)

    # CPU baseline (per-iteration time on a bounded problem)
    if args.baseline_problem == args.problem:
        bl_problem, bl_gt = problem, gt
    else:
        bl_problem, bl_gt = make_bal_like_problem(args.baseline_problem, dtype=np.float32)
    bl = solve_cpu_baseline(bl_problem, max_iters=args.baseline_iters,
                            time_budget_s=300.0)
    # scale baseline per-iter cost to the benched problem by observation count
    # (assembly and Schur work are ~linear in observations; conservative for
    # the camera-solve cube term, which favors the baseline)
    scale = n_obs / bl_gt["n_obs"]
    bl_sec_per_iter_scaled = bl["sec_per_iter"] * scale
    baseline_iters_per_sec = 1.0 / bl_sec_per_iter_scaled
    vs_baseline = iters_per_sec / baseline_iters_per_sec

    detail = {
        "problem": args.problem,
        "solver": args.solver,
        "n_cameras": problem.n_cameras,
        "n_points": problem.n_points,
        "n_obs": n_obs,
        "device": str(jax.devices()[0]),
        "dtype": "float32",
        "gen_s": gen_s,
        "compile_s": compile_s,
        "run_s": run_s,
        "lm_iters": iters,
        "lm_accepted": int(res.accepted),
        "iters_per_sec": iters_per_sec,
        "initial_cost": float(res.initial_cost),
        "final_cost": final_cost,
        "final_rmse_px": rmse,
        "time_to_1pct_s": time_to_1pct_s,
        "cost_history": hist.tolist(),
        "baseline": {
            "problem": args.baseline_problem,
            "method": "scipy Schur + dense Cholesky (MATLAB-class stand-in; "
                      "see SURVEY.md §6 — reference has no published numbers)",
            "sec_per_iter": bl["sec_per_iter"],
            "sec_per_iter_scaled_to_bench_problem": bl_sec_per_iter_scaled,
            "final_cost": bl["final_cost"],
            "obs_scale_factor": scale,
        },
        "vs_baseline_speedup": vs_baseline,
    }
    with open("bench_detail.json", "w") as fh:
        json.dump(detail, fh, indent=1)

    print(json.dumps({
        "metric": f"ba_iters_per_sec_{args.problem.replace('-', '_')}_1chip",
        "value": round(iters_per_sec, 3),
        "unit": "LM iters/s",
        "vs_baseline": round(vs_baseline, 2),
    }))


if __name__ == "__main__":
    main()
