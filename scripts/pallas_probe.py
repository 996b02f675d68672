#!/usr/bin/env python
"""Probe: does the Pallas segment-sum match the jnp fallback ON THE TPU
(not interpret mode) at realistic pair-plan shapes?  Round-2 triage for the
schur_sparse_pallas final-cost discrepancy seen in solver_compare.json.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_ba.io.bal import make_bal_like_problem
from tpu_ba.solver.pairs import build_pair_plan, precompute_pair_data
from tpu_ba.solver.normal import assemble
from tpu_ba.jacobians.analytic import jacobian_blocks_bal
from tpu_ba.kernels.segsum import sorted_segment_sum_t, build_segsum_plan

problem, gt = make_bal_like_problem("ladybug-49", dtype="float32")
print("problem:", problem.n_cameras, problem.n_points, problem.n_obs)

pairs = build_pair_plan(problem.cam_idx, problem.pt_idx, problem.n_obs,
                        problem.n_cameras, problem.n_points,
                        with_kernel_plans=True)
print("pairs:", pairs.n_pairs, "segments:", pairs.n_segments, "k_pad:", pairs.k_pad)
for nm, p in (("seg_plan", pairs.seg_plan), ("ci_plan", pairs.ci_plan)):
    print(nm, ": tile", p.tile, "chunk", p.chunk, "n_chunks", p.n_chunks,
          "grid", p.grid, "(vs rect", p.n_chunks * int(np.max(np.bincount(np.asarray(p.prog_chunk)))), ")")

# realistic values: the actual pair products at lam=1e-4
r, Jc, Jp = jacobian_blocks_bal(problem.cameras, problem.points, problem.obs_2d,
                                problem.cam_idx, problem.pt_idx, problem.mask)
B = assemble(r, Jc, Jp, problem.cam_idx, problem.pt_idx,
             problem.n_cameras, problem.n_points, 0, 1.0, problem.mask)
pd = precompute_pair_data(B, pairs)
from tpu_ba.solver.pairs import _pair_products_t
vals_t = jax.jit(lambda p: _pair_products_t(p, 1e-4, 9, 1e-6, 1e32))(pd.packed)
vals_t = jax.block_until_ready(vals_t)
print("vals_t:", vals_t.shape, vals_t.dtype)

# pair -> segment reduction
ref = jax.ops.segment_sum(vals_t.T, pairs.pair_seg, pairs.k_pad,
                          indices_are_sorted=True).T
got = sorted_segment_sum_t(vals_t, pairs.pair_seg, pairs.k_pad,
                           plan=pairs.seg_plan)
ref, got = np.asarray(ref, np.float64), np.asarray(got, np.float64)
err = np.abs(ref - got)
rel = err / (np.abs(ref) + 1e-6)
print("pair->seg: max abs err", err.max(), "max rel err", rel.max(),
      "ref max", np.abs(ref).max())
bad = np.argwhere(rel > 1e-3)
print("bad entries:", bad.shape[0])
if bad.shape[0]:
    for b in bad[:10]:
        print("  at", b, "ref", ref[tuple(b)], "got", got[tuple(b)])

# segment -> camera reduction (matvec shape): z (dc, k_pad) by seg_ci
dc = 9
z = got[:dc, :].astype(np.float32)
zj = jnp.asarray(z)
ref2 = jax.ops.segment_sum(zj.T, pairs.seg_ci, problem.n_cameras + 1,
                           indices_are_sorted=True).T
got2 = sorted_segment_sum_t(zj, pairs.seg_ci, problem.n_cameras + 1,
                            plan=pairs.ci_plan)
ref2, got2 = np.asarray(ref2, np.float64), np.asarray(got2, np.float64)
err2 = np.abs(ref2 - got2)
rel2 = err2 / (np.abs(ref2) + 1e-6)
print("seg->cam: max abs err", err2.max(), "max rel err", rel2.max())
