#!/usr/bin/env python
"""Compare every linear-solver path on the real TPU at BAL scale.

Round-2 mandate (VERDICT.md "Next round" items 1, 4, 5): measure the Pallas
paths on the chip — the round-1 headline came from plain-XLA ``schur_dense``
and every Pallas number was interpret-mode-only. Writes per-solver
compile/steady-state timings + final cost to ``scripts/solver_compare.json``.

Usage: python scripts/solver_compare.py [--problem ladybug-1723]
       [--solvers a,b,c] [--max-iters 50]
"""

from __future__ import annotations

import argparse
import json
import time
import traceback


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="ladybug-1723")
    ap.add_argument("--solvers", default="schur_dense,schur_sparse,"
                    "schur_sparse_pallas,schur_pcg,schur_pcg_pallas")
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--cg-iters", type=int, default=50)
    ap.add_argument("--cg-tol", type=float, default=1e-2)
    ap.add_argument("--out", default="scripts/solver_compare.json")
    args = ap.parse_args()

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from tpu_ba.core import LMConfig
    from tpu_ba.io.bal import make_bal_like_problem
    from tpu_ba.solver.lm import solve

    problem, gt = make_bal_like_problem(args.problem, dtype="float32")
    results = {"problem": args.problem, "n_obs": gt["n_obs"],
               "device": str(jax.devices()[0]), "solvers": {}}

    for solver in args.solvers.split(","):
        solver = solver.strip()
        entry = {}
        try:
            cfg = LMConfig(max_iters=args.max_iters, linear_solver=solver,
                           cg_max_iters=args.cg_iters, cg_tol=args.cg_tol,
                           init_lambda=1e-4)
            t0 = time.time()
            res = solve(problem, cfg)
            _ = float(res.cost)
            entry["first_call_s"] = time.time() - t0

            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                res = solve(problem, cfg)
                jax.block_until_ready(res)
                _ = float(res.cost)
                best = min(best, time.time() - t0)
            iters = int(res.iterations)
            entry.update(
                run_s=best,
                lm_iters=iters,
                lm_accepted=int(res.accepted),
                iters_per_sec=iters / max(best, 1e-9),
                accepted_per_sec=int(res.accepted) / max(best, 1e-9),
                final_cost=float(res.cost),
                cg_total=int(sum(res.cg_history.tolist())),
            )
            print(f"[{solver}] first={entry['first_call_s']:.1f}s "
                  f"run={best:.2f}s iters/s={entry['iters_per_sec']:.3f} "
                  f"cost={entry['final_cost']:.4g}", flush=True)
        except Exception as e:  # keep going: one broken path must not kill the sweep
            entry["error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()
        results["solvers"][solver] = entry
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
