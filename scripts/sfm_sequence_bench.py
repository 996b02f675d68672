#!/usr/bin/env python
"""Config-4 benchmark: incremental SfM on a long rendered sequence + ATE.

Runs the full pipeline (detect → match → two-view init → PnP → triangulate
→ windowed BA → global BA), reports ATE/RPE vs the renderer's ground-truth
trajectory (tpu_ba/bench/ate.py, Umeyama-aligned), reprojection RMSE, and
stage wall-clocks; optionally routes the trajectory through the pose-graph
bridge. Writes sfm_bench.json.

Usage: python scripts/sfm_sequence_bench.py [--frames 60] [--points 600]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--points", type=int, default=600)
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--out", default="sfm_bench.json")
    args = ap.parse_args()

    import numpy as np

    from tpu_ba.bench.ate import ate_rmse, rpe_stats
    from tpu_ba.io.sequences import render_blob_sequence
    from tpu_ba.sfm.incremental import SfMConfig, run_incremental_sfm

    t0 = time.time()
    frames, gt = render_blob_sequence(n_frames=args.frames,
                                      n_points=args.points, seed=args.seed)
    render_s = time.time() - t0
    K = gt["K"]
    print(f"rendered {args.frames} frames ({render_s:.1f}s)", flush=True)

    t0 = time.time()
    res = run_incremental_sfm(frames, K, SfMConfig(seed=args.seed))
    sfm_s = time.time() - t0
    reg = res.registered
    print(f"sfm: {int(reg.sum())}/{args.frames} registered, "
          f"{res.report['n_points']} points, {res.report['n_obs']} obs, "
          f"{sfm_s:.1f}s", flush=True)

    ate = ate_rmse(res.poses, gt["poses"], mask=reg)
    rpe = rpe_stats(res.poses, gt["poses"], mask=reg)
    n_obs = res.report["n_obs"]
    rmse_px = float(np.sqrt(res.final_cost * 2.0 / max(n_obs, 1)))

    # pose-graph bridge smoke: odometry graph + one loop-closure edge from
    # ground truth between the endpoints (simulating a relocalization)
    t0 = time.time()
    from tpu_ba.sfm.posegraph_bridge import refine_sfm_with_pose_graph

    res_pg, pg_cost, pg_iters = refine_sfm_with_pose_graph(res)
    pg_s = time.time() - t0
    ate_pg = ate_rmse(res_pg.poses, gt["poses"], mask=reg)

    out = {
        "frames": args.frames,
        "points_rendered": args.points,
        "registered": int(reg.sum()),
        "map_points": res.report["n_points"],
        "observations": n_obs,
        "reproj_rmse_px": rmse_px,
        "ate": ate,
        "rpe": rpe,
        "ate_after_posegraph": ate_pg,
        "render_s": render_s,
        "sfm_s": sfm_s,
        "posegraph_s": pg_s,
        "pnp_failures": [p for p in res.report["pnp"] if not p["registered"]],
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "pnp_failures"},
                     indent=1))


if __name__ == "__main__":
    main()
