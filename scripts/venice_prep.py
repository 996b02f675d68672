#!/usr/bin/env python
"""Generate the Venice-1778 stand-in and build its plans (host-side prep,
timed). Run under JAX_PLATFORMS=cpu; the TPU solve comes after."""
import time

import numpy as np

t0 = time.time()
from tpu_ba.io.bal import make_bal_like_problem

problem, gt = make_bal_like_problem("venice-1778", dtype=np.float32)
print(f"generate: {time.time()-t0:.1f}s  C={problem.n_cameras} "
      f"P={problem.n_points} O={problem.n_obs} padded={problem.obs_2d.shape[0]}",
      flush=True)

t0 = time.time()
from tpu_ba.solver.plans import build_plans

plans = build_plans(problem.cam_idx, problem.pt_idx, problem.n_cameras,
                    problem.n_points)
print(f"assembly plans: {time.time()-t0:.1f}s  cam_grid={plans.cam_plan.grid} "
      f"pt_grid={plans.pt_plan.grid} tile={plans.cam_plan.tile}", flush=True)

t0 = time.time()
from tpu_ba.solver.pairs import build_pair_plan

pairs = build_pair_plan(problem.cam_idx, problem.pt_idx, problem.n_obs,
                        problem.n_cameras, problem.n_points,
                        with_kernel_plans=True, symmetric=True)
print(f"pair plan: {time.time()-t0:.1f}s  pairs={pairs.n_pairs:,} "
      f"K={pairs.n_segments:,} k_pad={pairs.k_pad:,} heavy={pairs.n_heavy_obs}",
      flush=True)
packed_gb = pairs.n_pairs * 64 * 4 / 1e9
print(f"packed pair data: {packed_gb:.2f} GB (HBM)", flush=True)
