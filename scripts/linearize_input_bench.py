#!/usr/bin/env python
"""Decompose the `linearize` phase (the largest in the round-4 profile:
10.7 ms @ 12 GB/s) into its input components, measured on the chip:

  g_cam   cameras[ci]        row gather (O, 9)     from (C, 9)
  g_pt    points[pi]         row gather (O, 3)     from (P, 3)
  pack    the full (16, O) packed-input build (gathers + concat)
  kernel  the Pallas fused linearize+assemble pass alone, pre-packed input
  pt_seg  the point-side segment reduction

This tells us whether in-kernel camera expansion (windowed one-hot on the
MXU, est. ~3.7 ms of bf16 passes at ladybug-1723) would actually beat the
XLA gather+pack path it would replace — measure before kernel surgery
(VERDICT r3 weak #3 / next #7)."""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import numpy as np

REPS = 16


def timeit_scan(fn, carry, reps=REPS, trials=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry):
        out = jax.lax.fori_loop(0, reps, lambda _, c: fn(c), carry)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l) for l in leaves)

    _ = float(run(carry))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = float(run(carry))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    import jax
    import jax.numpy as jnp

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()
    from tpu_ba.io.bal import make_bal_like_problem
    from tpu_ba.kernels.linearize import (_IN_ROWS, fused_linearize_assemble)
    from tpu_ba.solver.plans import build_plans, pt_segsum_t

    problem, gt = make_bal_like_problem("ladybug-1723", dtype=np.float32)
    # pt_buckets=True so the 'pt_segsum' phase measures the degree-bucketed
    # reduction (opt-in since round 4 — it measured slower); production
    # plans have no buckets and take the one-hot path (= the
    # 'pt_segsum_onehot' phase below)
    plans = build_plans(problem.cam_idx, problem.pt_idx,
                        problem.cameras.shape[0], problem.points.shape[0],
                        pt_buckets=True)
    cams, pts = problem.cameras, problem.points
    obs, ci, pi, mask = (problem.obs_2d, problem.cam_idx, problem.pt_idx,
                         problem.mask)
    O = obs.shape[0]
    P = pts.shape[0]
    out = {}

    def ph_gcam(c):
        cams, acc = c
        g = cams[ci]
        return (cams + 1e-30, acc + jnp.sum(g) * 1e-30)

    out["g_cam"] = {"ms": timeit_scan(ph_gcam, (cams, jnp.float32(0))) * 1e3,
                    "mb": O * 9 * 4 / 1e6}

    def ph_gpt(c):
        pts, acc = c
        g = pts[pi]
        return (pts + 1e-30, acc + jnp.sum(g) * 1e-30)

    out["g_pt"] = {"ms": timeit_scan(ph_gpt, (pts, jnp.float32(0))) * 1e3,
                   "mb": O * 3 * 4 / 1e6}

    def ph_pack(c):
        cams, pts, acc = c
        dt = cams.dtype
        camg = cams[ci].T
        ptg = pts[pi].T
        packed = jnp.concatenate([
            camg, ptg, obs.T, mask.astype(dt)[None, :],
            jnp.zeros((_IN_ROWS - 15, O), dt)], axis=0)
        return (cams + 1e-30, pts, acc + jnp.sum(packed[:, 0]) * 1e-30)

    out["pack_total"] = {
        "ms": timeit_scan(ph_pack, (cams, pts, jnp.float32(0))) * 1e3,
        "mb": O * (12 + 16) * 4 / 1e6}

    def ph_full(c):
        cams, pts, acc = c
        U, gc, W, pt_vals = fused_linearize_assemble(
            cams, pts, obs, ci, pi, mask, plans.cam_plan)
        return (cams + 1e-30, pts,
                acc + (jnp.sum(U) + jnp.sum(gc) + jnp.sum(W[0])
                       + jnp.sum(pt_vals[12])) * 1e-30)

    out["full_linearize_assemble"] = {
        "ms": timeit_scan(ph_full, (cams, pts, jnp.float32(0))) * 1e3}

    def ph_ptseg(c):
        v, acc = c
        ptp = pt_segsum_t(plans, v, pi, P)
        return (v + 1e-30, acc + jnp.sum(ptp) * 1e-30)

    v0 = jnp.ones((12, O), jnp.float32)
    out["pt_segsum_bucketed"] = {
        "ms": timeit_scan(ph_ptseg, (v0, jnp.float32(0))) * 1e3}

    # the degree-bucketed alternative (and the one-hot-only fallback)
    import dataclasses as _dc

    plans_onehot = _dc.replace(plans, bucket_idx=(), bucket_degrees=())

    def ph_ptseg_onehot(c):
        v, acc = c
        ptp = pt_segsum_t(plans_onehot, v, pi, P)
        return (v + 1e-30, acc + jnp.sum(ptp) * 1e-30)

    out["pt_segsum_onehot"] = {
        "ms": timeit_scan(ph_ptseg_onehot, (v0, jnp.float32(0))) * 1e3}

    # chunk sweep for the one-hot pt plan: its MXU work scales with the
    # output-chunk width; point segments are tiny so narrow chunks waste
    # far less (per-program one-hot is (rows, tile) @ (tile, chunk))
    from tpu_ba.kernels.segsum import build_segsum_plan, sorted_segment_sum_t

    pk = plans.pt_sorted_keys
    perm = plans.perm_pt
    for ch in (128, 256, 512):
        tile_c = 2048 if len(np.asarray(pk)) % 2048 == 0 else 1024
        plan_c = build_segsum_plan(np.asarray(pk), P, tile=tile_c, chunk=ch)

        def ph(c, plan_c=plan_c):
            v, acc = c
            ptp = sorted_segment_sum_t(v[:, perm], pk, P, plan=plan_c)
            return (v + 1e-30, acc + jnp.sum(ptp) * 1e-30)

        out[f"pt_segsum_chunk{ch}"] = {
            "ms": timeit_scan(ph, (v0, jnp.float32(0))) * 1e3}

    for k, v in out.items():
        mb = v.get("mb")
        rate = f"  {mb / v['ms'] / 1e3:6.1f} GB/s" if mb else ""
        print(f"{k:26s} {v['ms']:7.3f} ms{rate}")
    with open("scripts/linearize_input_bench.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
