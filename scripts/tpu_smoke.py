#!/usr/bin/env python
"""TPU smoke gate — MANDATORY before any commit touching tpu_ba/kernels/,
tpu_ba/solver/, or bench.py.

Why this exists: round 3 shipped a Pallas kernel (fused_cost) that passed
every test — all kernel tests run interpret=True on CPU — but could not
LOWER through Mosaic on the real chip ("Cannot store scalars to VMEM"),
turning the driver bench into a crash dump (BENCH_r03.json rc=1;
VERDICT.md round 3, missing #1/#2). This script compiles and runs every
production kernel through the real Mosaic lowering in ~1-2 minutes:

  1. each kernel standalone, interpret=False, vs its jnp/interpret oracle;
  2. the full production solver (schur_sparse_pallas) on a small BAL-like
     problem for every robust kind + a frozen-intrinsics config, checked
     against the non-Pallas schur_sparse solve at f32 tolerance.

Exit 0 = safe to commit. Any Mosaic lowering failure, crash, or oracle
divergence exits non-zero with the failing stage named.

NOTE the single-client rule (kernels/verify skill): do not run this while
any other process is using the TPU.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

# runnable as `python scripts/tpu_smoke.py` from anywhere: python puts the
# script's dir (scripts/) on sys.path, not the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fail(stage, exc=None):
    print(f"[tpu-smoke] FAIL at {stage}: {exc!r}" if exc else
          f"[tpu-smoke] FAIL at {stage}")
    sys.exit(1)


def main():
    t_start = time.time()
    import jax
    import jax.numpy as jnp

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    print(f"[tpu-smoke] device={dev} backend={jax.default_backend()}")
    if not on_tpu:
        print("[tpu-smoke] WARNING: no TPU visible — this run exercises "
              "interpret mode only and is NOT a valid commit gate.")

    from tpu_ba.core import LMConfig
    from tpu_ba.io.bal import make_bal_like_problem

    problem, _ = make_bal_like_problem("ladybug-49", dtype=np.float32)

    # ---- stage 1: standalone kernels, interpret=False ---------------------
    from tpu_ba.kernels.linearize import fused_cost, fused_linearize_assemble
    from tpu_ba.residuals.reprojection import residuals_bal
    from tpu_ba.residuals.robust import robust_rho
    from tpu_ba.solver.plans import build_plans

    p = problem
    plans = build_plans(p.cam_idx, p.pt_idx, p.cameras.shape[0],
                        p.points.shape[0])
    for rk in (0, 1, 2, 3):
        stage = f"fused_cost robust_kind={rk}"
        try:
            v = float(fused_cost(p.cameras, p.points, p.obs_2d, p.cam_idx,
                                 p.pt_idx, p.mask, robust_kind=rk,
                                 robust_scale=2.0, interpret=False))
            r = residuals_bal(p.cameras, p.points, p.obs_2d, p.cam_idx,
                              p.pt_idx, p.mask)
            sr = jnp.sum(r * r, axis=-1)
            ref = float(0.5 * jnp.sum(robust_rho(rk, sr, 2.0) * p.mask))
            rel = abs(v - ref) / max(abs(ref), 1e-30)
            if not (np.isfinite(v) and rel < 1e-3):
                fail(stage, f"chip={v} oracle={ref} rel={rel}")
            print(f"[tpu-smoke] ok {stage}: rel={rel:.2e}")
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001 — any lowering error = gate fail
            fail(stage, e)

    stage = "fused_linearize_assemble (+freeze_cols)"
    try:
        for freeze in ((), (6, 7, 8)):
            U, gc, W, pt_vals = fused_linearize_assemble(
                p.cameras, p.points, p.obs_2d, p.cam_idx, p.pt_idx, p.mask,
                plans.cam_plan, robust_kind=1, robust_scale=2.0,
                freeze_cols=freeze, interpret=False)
            Ui, gci, Wi, pvi = fused_linearize_assemble(
                p.cameras, p.points, p.obs_2d, p.cam_idx, p.pt_idx, p.mask,
                plans.cam_plan, robust_kind=1, robust_scale=2.0,
                freeze_cols=freeze, interpret=True)
            for a, b, nm in ((U, Ui, "U"), (gc, gci, "gc"), (W, Wi, "W"),
                             (pt_vals, pvi, "pt_vals")):
                scale = float(jnp.max(jnp.abs(b))) or 1.0
                err = float(jnp.max(jnp.abs(a - b))) / scale
                # 2e-3: chip runs the 3-pass bf16 one-hot reduction vs the
                # interpret oracle's exact f32 matmul — same tolerance class
                # as tests/test_kernels.py (rtol 1e-3 on entries ~1e5)
                if not err < 2e-3:
                    fail(stage, f"{nm} freeze={freeze} rel_max_err={err}")
        print(f"[tpu-smoke] ok {stage}")
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        fail(stage, e)

    # slot-major band build (level-1 bucket kernels + level-2 fold) vs the
    # jnp oracle — explicit slots=True so the small problem engages it
    stage = "fused slot band build (slotband)"
    try:
        from tpu_ba.solver.normal import assemble
        from tpu_ba.jacobians import jacobian_blocks_bal
        from tpu_ba.solver.pairs import (_compact_blocks, build_pair_plan,
                                         precompute_pair_data)

        r, Jc, Jp = jacobian_blocks_bal(
            p.cameras, p.points, p.obs_2d, p.cam_idx, p.pt_idx, p.mask)
        B = assemble(r, Jc, Jp, p.cam_idx, p.pt_idx, p.cameras.shape[0],
                     p.points.shape[0], 0, 1.0, p.mask)
        kwp = dict(symmetric=True, banded=True, slots=True, tracks=False)
        pairs_k = build_pair_plan(p.cam_idx, p.pt_idx, p.n_obs,
                                  p.cameras.shape[0], p.points.shape[0],
                                  with_kernel_plans=True, **kwp)
        pairs_j = build_pair_plan(p.cam_idx, p.pt_idx, p.n_obs,
                                  p.cameras.shape[0], p.points.shape[0],
                                  with_kernel_plans=False, **kwp)
        if pairs_k.slot is None:
            fail(stage, "slot layout did not engage")
        pd_k = precompute_pair_data(B, pairs_k)
        pd_j = precompute_pair_data(B, pairs_j)
        lam = jnp.asarray(1e-3, jnp.float32)
        blk_k = _compact_blocks(B, lam, pairs_k, pd_k, 1e-6, 1e32)
        blk_j = _compact_blocks(B, lam, pairs_j, pd_j, 1e-6, 1e32)
        scale = float(jnp.max(jnp.abs(blk_j))) or 1.0
        err = float(jnp.max(jnp.abs(blk_k[:, :pairs_k.k_band]
                                    - blk_j[:, :pairs_j.k_band]))) / scale
        if not err < 2e-3:
            fail(stage, f"rel_max_err={err}")
        print(f"[tpu-smoke] ok {stage}: rel_max_err={err:.2e} "
              f"(slot pts {pairs_k.slot.n_tracked}, "
              f"buckets {pairs_k.slot.degrees})")
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        fail(stage, e)

    # ---- stage 2: production solver end-to-end, kernels vs jnp ------------
    from tpu_ba.solver.lm import solve

    for robust, rscale in (("none", 1.0), ("huber", 2.0), ("cauchy", 2.0)):
        stage = f"schur_sparse_pallas e2e robust={robust}"
        try:
            from tpu_ba.residuals.robust import ROBUST_KINDS

            mk = lambda solver: LMConfig(  # noqa: E731
                max_iters=6, linear_solver=solver, cg_max_iters=25,
                cg_tol=1e-3, robust_kind=ROBUST_KINDS[robust],
                robust_scale=rscale, init_lambda=1e-4)
            res_k = solve(problem, mk("schur_sparse_pallas"))
            ck = float(res_k.cost)
            res_j = solve(problem, mk("schur_sparse"))
            cj = float(res_j.cost)
            rel = abs(ck - cj) / max(abs(cj), 1e-30)
            if not (np.isfinite(ck) and rel < 5e-3):
                fail(stage, f"pallas={ck} jnp={cj} rel={rel}")
            print(f"[tpu-smoke] ok {stage}: cost={ck:.6g} "
                  f"(vs jnp rel={rel:.2e}, {int(res_k.iterations)} iters)")
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001
            fail(stage, e)

    # PCR block-tridiagonal preconditioner through the VMEM PCG kernel
    stage = "schur_sparse_pallas e2e precond=tridiag"
    try:
        from tpu_ba.residuals.robust import ROBUST_KINDS  # noqa: F811

        cfg_t = LMConfig(max_iters=6, linear_solver="schur_sparse_pallas",
                         cg_max_iters=50, cg_tol=1e-4, init_lambda=1e-4,
                         precond="tridiag")
        res_t = solve(problem, cfg_t)
        cfg_j = LMConfig(max_iters=6, linear_solver="schur_sparse_pallas",
                         cg_max_iters=50, cg_tol=1e-4, init_lambda=1e-4)
        res_j2 = solve(problem, cfg_j)
        ct, cj2 = float(res_t.cost), float(res_j2.cost)
        rel = abs(ct - cj2) / max(abs(cj2), 1e-30)
        if not (np.isfinite(ct) and rel < 5e-3):
            fail(stage, f"tridiag={ct} jacobi={cj2} rel={rel}")
        print(f"[tpu-smoke] ok {stage}: cost={ct:.6g} (vs jacobi "
              f"rel={rel:.2e}, cg {int(np.asarray(res_t.cg_history).sum())} "
              f"vs {int(np.asarray(res_j2.cg_history).sum())})")
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        fail(stage, e)

    # frozen-intrinsics path (config-3 style): just must compile + run finite
    stage = "schur_sparse_pallas e2e freeze_camera_cols=(6,7,8)"
    try:
        cfg = LMConfig(max_iters=4, linear_solver="schur_sparse_pallas",
                       cg_max_iters=25, cg_tol=1e-3, init_lambda=1e-4,
                       freeze_camera_cols=(6, 7, 8))
        res = solve(problem, cfg)
        if not np.isfinite(float(res.cost)):
            fail(stage, f"cost={float(res.cost)}")
        print(f"[tpu-smoke] ok {stage}: cost={float(res.cost):.6g}")
    except SystemExit:
        raise
    except Exception as e:  # noqa: BLE001
        fail(stage, e)

    print(f"[tpu-smoke] ALL OK in {time.time() - t_start:.1f}s "
          f"({'TPU Mosaic lowering' if on_tpu else 'interpret only'})")


if __name__ == "__main__":
    main()
