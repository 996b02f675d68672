#!/usr/bin/env python
"""Measured per-phase breakdown of the production solve on the real chip.

VERDICT.md round 2, next #1: "replace the hand roofline in bench.py with
measured per-phase bytes/FLOPs" — the 7.4%-of-peak headline was modeled, not
measured, and charged 3 blk reads per LM iteration while CG actually re-reads
the compact blocks ~76 times. This script times every phase of one LM
iteration of the schur_sparse_pallas path separately, each under a jitted
``fori_loop`` (the axon dispatch latency is ~23 ms — single-call timing is
meaningless), and derives the *measured* bytes and GB/s per phase:

  linearize   fused Pallas linearize+assemble + point-side reduce
  pair_gather λ-free pack of W/V into pair order (per linearization)
  blk_build   fused Pallas damped pair products → compact blocks (per λ)
  matvec      one banded S·x (per CG iteration)
  cg8         8 PCG iterations end-to-end (matvec + dots + precond + axpy)
  rhs_back    Schur RHS + back-substitution (per λ)
  cost_eval   residual + robust cost (per λ)

The phase table is written to scripts/phase_profile_<problem>.json; bench.py
reads it (if present for the bench problem) to report a measured roofline
instead of the hand model. An optional jax.profiler trace attempt is made
and its outcome recorded (the axon backend has no host callbacks and may not
support device tracing — the fori_loop wall-clock numbers are the evidence
either way).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import numpy as np

REPS = 16


def timeit_scan(fn, carry, reps=REPS, trials=4):
    """Best wall-clock of ``fn`` iterated ``reps`` times inside one jit.

    ``fn``: carry -> carry (array pytree). A scalar is fetched at the end to
    force completion on the remote backend."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(carry):
        out = jax.lax.fori_loop(0, reps, lambda _, c: fn(c), carry)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l) for l in leaves if l.dtype != bool)

    _ = float(run(carry))          # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = float(run(carry))
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problem", default="ladybug-1723")
    ap.add_argument("--lam", type=float, default=1e-4)
    ap.add_argument("--try-trace", action="store_true",
                    help="also attempt a jax.profiler device trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_ba.utils import enable_compilation_cache

    enable_compilation_cache()

    from tpu_ba.core import LMConfig
    from tpu_ba.io.bal import make_bal_like_problem
    from tpu_ba.kernels.linearize import fused_linearize_assemble
    from tpu_ba.solver import pairs as pairs_mod
    from tpu_ba.solver.batched_linalg import inv_spd_small
    from tpu_ba.solver.normal import BlockSystem, damp_blocks
    from tpu_ba.solver.pcg import pcg
    from tpu_ba.solver.plans import build_plans, pt_segsum_t
    from tpu_ba.solver.schur import back_substitute, inv3x3_rows, schur_rhs

    cfg = LMConfig(linear_solver="schur_sparse_pallas")
    t0 = time.time()
    problem, gt = make_bal_like_problem(args.problem, dtype=np.float32)
    print(f"problem: {time.time()-t0:.1f}s  C={problem.n_cameras} "
          f"P={problem.n_points} O={gt['n_obs']}")

    t0 = time.time()
    plans = build_plans(problem.cam_idx, problem.pt_idx,
                        problem.cameras.shape[0], problem.points.shape[0])
    pairs = pairs_mod.build_pair_plan(
        problem.cam_idx, problem.pt_idx, problem.n_obs,
        problem.cameras.shape[0], problem.points.shape[0],
        with_kernel_plans=True, symmetric=True)
    print(f"plans: {time.time()-t0:.1f}s  Np={pairs.n_pairs} "
          f"K={pairs.n_segments} k_pad={pairs.k_pad} banded={pairs.banded} "
          f"Bn={len(pairs.band_offsets)} c_pad={pairs.c_pad} "
          f"k_band={pairs.k_band} heavy_obs={pairs.n_heavy_obs}")

    O = problem.obs_2d.shape[0]
    C = problem.n_cameras
    P = problem.points.shape[0]
    Np = pairs.n_pairs
    dc = 9
    lam = jnp.asarray(args.lam, jnp.float32)

    cams, pts = problem.cameras, problem.points
    obs, ci, pi, mask = (problem.obs_2d, problem.cam_idx,
                         problem.pt_idx, problem.mask)

    # ---- build the fixed inputs once -------------------------------------
    @jax.jit
    def make_B(cams, pts):
        U, gc, W, pt_vals = fused_linearize_assemble(
            cams, pts, obs, ci, pi, mask, plans.cam_plan,
            robust_kind=cfg.robust_kind, robust_scale=cfg.robust_scale,
            freeze_cols=())
        ptp = pt_segsum_t(plans, pt_vals[:12], pi, P)
        return BlockSystem(U=U, V=ptp[:9], W=W, gc=gc, gp=ptp[9:12],
                           cost=0.5 * jnp.sum(pt_vals[12]),
                           cam_idx=ci, pt_idx=pi)

    B = jax.block_until_ready(make_B(cams, pts))
    pair_data = jax.block_until_ready(
        jax.jit(lambda b: pairs_mod.precompute_pair_data(b, pairs))(B))
    blk0 = jax.block_until_ready(jax.jit(
        lambda pd, l: pairs_mod._compact_blocks(
            B, l, pairs, pd, cfg.diag_floor, cfg.diag_ceil))(pair_data, lam))

    phases = {}

    # ---- phase: linearize + assemble -------------------------------------
    def ph_linearize(c):
        cams, pts = c
        U, gc, W, pt_vals = fused_linearize_assemble(
            cams, pts, obs, ci, pi, mask, plans.cam_plan,
            robust_kind=cfg.robust_kind, robust_scale=cfg.robust_scale,
            freeze_cols=())
        ptp = pt_segsum_t(plans, pt_vals[:12], pi, P)
        # fold outputs back into the carry so the loop can't be elided
        d = (jnp.sum(ptp) + jnp.sum(U) + jnp.sum(gc) + jnp.sum(W[0])) * 1e-30
        return (cams + d, pts)

    phases["linearize"] = {
        "s": timeit_scan(ph_linearize, (cams, pts)),
        "per": "linearization",
        # read obs(8)+idx(8)+mask(1) +cams/pts; write W(108)+ptvals(52)+U/gc
        "bytes": O * (17 + 108 + 52) + C * 81 * 4 + P * 12 * 4,
    }

    # ---- phase: pair gather (λ-free pack) --------------------------------
    def ph_gather(c):
        B2, acc = c
        pd = pairs_mod.precompute_pair_data(B2, pairs)
        # force EVERY pack component: with only pd.packed touched, XLA
        # dead-code-eliminates the slot/track/U_t gathers and the phase
        # under-measures the λ-free pack by its dominant part on slot-major
        # problems (round-5 fix — the venice "1.9 ms pair_gather" artifact)
        probe = pd.packed[0, :1]
        if pd.trk_W is not None:
            probe = probe + pd.trk_W[0, 0, :1] + pd.trk_V[0, :1]
        if pd.slot_W is not None:
            for w, v in zip(pd.slot_W, pd.slot_V):
                probe = probe + w[0, 0, :1] + v[0, :1]
        if pd.U_t is not None:
            probe = probe + pd.U_t[0, :1]
        return (B2, acc + probe * 1e-30)

    # pack bytes: legacy pairs (63 f32 read+write each) + one O-sized
    # permutation per slot/track layout (27 W + 9 V f32 read+write per
    # covered observation) + the U_t repack
    pack_obs = 0
    if pairs.track is not None:
        pack_obs += int(np.asarray(pairs.track.slot_mask).sum())
    if pairs.slot is not None:
        pack_obs += sum(int(np.asarray(m).sum())
                        for m in pairs.slot.slot_mask)
    phases["pair_gather"] = {
        "s": timeit_scan(ph_gather, (B, jnp.zeros((1,), jnp.float32))),
        "per": "linearization",
        # gather-read + write: legacy pairs, slot/track packs, U_t
        "bytes": (Np * (63 + 63) * 4 + pack_obs * (36 + 36) * 4
                  + (2 * 81 * pairs.c_pad * 4 if pairs.banded else 0)),
    }

    # ---- phase: compact block build (fused Pallas, per λ) ----------------
    def ph_blk(c):
        pd, l, acc = c
        blk = pairs_mod._compact_blocks(B, l, pairs, pd,
                                        cfg.diag_floor, cfg.diag_ceil)
        return (pd, l + 1e-30, acc + blk[0, :1] * 1e-30)

    phases["blk_build"] = {
        "s": timeit_scan(ph_blk, (pair_data, lam, jnp.zeros((1,), jnp.float32))),
        "per": "lambda_retry",
        "bytes": Np * 63 * 4 + pairs.k_pad * 81 * 4,
    }

    # ---- phase: banded matvec (per CG iteration) -------------------------
    Ul, Vl_pts = damp_blocks(B, lam, cfg.diag_floor, cfg.diag_ceil)
    Ul = jax.block_until_ready(Ul)
    heavy_term = None
    if pairs.n_heavy_pts:
        heavy_term, _ = pairs_mod._heavy_operator(
            pair_data, lam, pairs, dc, cfg.diag_floor, cfg.diag_ceil)
    matvec = pairs_mod.make_banded_matvec(blk0, Ul, pairs, dc, heavy_term)

    x0 = jnp.ones((C, dc), jnp.float32)

    def ph_matvec(x):
        y = matvec(x)
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-20)

    mv_bytes = (pairs.k_band * 81 * 4                      # band blocks
                + (pairs.k_pad - pairs.k_band) * 81 * 4    # off-band blocks
                + C * 81 * 4                               # Ul
                + pairs.n_heavy_obs * 27 * 4 * 2)          # heavy W 2 passes
    phases["matvec"] = {
        "s": timeit_scan(ph_matvec, x0),
        "per": "cg_iteration",
        "bytes": mv_bytes,
    }

    # ---- phase: 8 full PCG iterations ------------------------------------
    diag_T = blk0[:, :C] if pairs.banded else blk0[:, pairs.diag_pos]
    diag_S = Ul - diag_T.reshape(dc, dc, C).transpose(2, 0, 1)
    Minv = jax.block_until_ready(inv_spd_small(diag_S))

    def precond(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    b_rhs = jax.block_until_ready(
        jax.jit(lambda B2: schur_rhs(B2, inv3x3_rows(
            damp_blocks(B2, lam, cfg.diag_floor, cfg.diag_ceil)[1])))(B))

    def ph_cg8(c):
        b2, acc = c
        x, k, ok = pcg(matvec, b2, precond, max_iters=8, tol=0.0)
        return (b2, acc + x[0, :1] * 1e-30)

    t_cg8 = timeit_scan(ph_cg8, (b_rhs, jnp.zeros((1,), jnp.float32)),
                        reps=4, trials=4)
    phases["cg_iteration_xla"] = {
        "s": t_cg8 / 8.0,
        "per": "cg_iteration",
        "bytes": mv_bytes + C * 81 * 4,                    # + Minv read
        "note": "jnp PCG body incl. dots/precond/axpys, measured as cg8/8",
    }

    # ---- phase: VMEM-resident PCG kernel (the production CG path) --------
    from tpu_ba.kernels.pcg_band import band_vmem_bytes, pcg_banded

    kernel_ok = (pairs.banded and pairs.n_segments <= pairs.k_band
                 and pairs.n_heavy_pts == 0
                 and band_vmem_bytes(pairs, dc) <= 32 * 2**20)
    if kernel_ok:
        KIT = 64

        def ph_kern(c):
            b2, acc = c
            x, k, ok = pcg_banded(blk0, Ul, Minv, b2, pairs,
                                  max_iters=KIT, tol=0.0)
            return (b2, acc + x[0, :1] * 1e-30)

        t_k = timeit_scan(ph_kern, (b_rhs, jnp.zeros((1,), jnp.float32)),
                          reps=4, trials=4)
        phases["cg_iteration"] = {
            "s": t_k / KIT,
            "per": "cg_iteration",
            # the loop's working set is VMEM-resident: HBM traffic is the
            # one-time operand load, amortized over the solve's iterations
            "bytes": (mv_bytes + 2 * C * 81 * 4) // KIT,
            "note": f"VMEM-resident PCG kernel, measured as {KIT} "
                    "fixed iterations / iteration count",
        }
    else:
        phases["cg_iteration"] = dict(phases["cg_iteration_xla"])
        phases["cg_iteration"]["note"] = "jnp path (kernel not applicable)"

    # ---- phase: RHS + back-substitution ----------------------------------
    def ph_rhs(c):
        B2, acc = c
        _, Vl = damp_blocks(B2, lam, cfg.diag_floor, cfg.diag_ceil)
        Vinv = inv3x3_rows(Vl)
        b2 = schur_rhs(B2, Vinv)
        dxp = back_substitute(B2, Vinv, b2 * 1e-3)
        return (B2, acc + b2[0, :1] * 1e-30 + dxp[0, :1] * 1e-30)

    phases["rhs_back"] = {
        "s": timeit_scan(ph_rhs, (B, jnp.zeros((1,), jnp.float32))),
        "per": "lambda_retry",
        # two passes over W (gather by obs) + V inverses + point vectors
        "bytes": O * 108 * 2 + P * 9 * 4 * 2,
    }

    # ---- phase: cost eval (the production fused kernel) -------------------
    from tpu_ba.kernels.linearize import fused_cost

    def ph_cost(c):
        cams2, acc = c
        cost = fused_cost(cams2, pts, obs, ci, pi, mask,
                          robust_kind=cfg.robust_kind,
                          robust_scale=cfg.robust_scale)
        return (cams2 + cost * 1e-30, acc)

    phases["cost_eval"] = {
        "s": timeit_scan(ph_cost, (cams, jnp.zeros((1,), jnp.float32))),
        "per": "lambda_retry",
        "bytes": O * 17,
    }

    # ---- phase: damping + small-block inverses + preconditioner (per λ) ---
    def ph_damp(c):
        lam2, acc = c
        Ul2, Vl2 = damp_blocks(B, lam2, cfg.diag_floor, cfg.diag_ceil)
        Vinv2 = inv3x3_rows(Vl2)
        diag_S2 = Ul2 - blk0[:, :C].reshape(dc, dc, C).transpose(2, 0, 1)
        Minv2 = inv_spd_small(diag_S2)
        return (lam2 * (1.0 + 1e-30),
                acc + (jnp.sum(Minv2[0]) + jnp.sum(Vinv2[:, 0])
                       + jnp.sum(Ul2[0])) * 1e-30)

    phases["damp_inv"] = {
        "s": timeit_scan(ph_damp, (lam, jnp.zeros((1,), jnp.float32))),
        "per": "lambda_retry",
        # V blocks r+w (9P ×2 for damp + inv), U blocks, diag_S + Minv
        "bytes": (P * 9 * 3 + C * 81 * 4) * 4,
    }

    # ---- phase: PCG kernel operand repack (per λ) --------------------------
    c_pad = pairs.c_pad
    Ul0, Vl0 = damp_blocks(B, lam, cfg.diag_floor, cfg.diag_ceil)
    diag_S0 = Ul0 - blk0[:, :C].reshape(dc, dc, C).transpose(2, 0, 1)
    Minv0 = inv_spd_small(diag_S0)
    b0 = schur_rhs(B, inv3x3_rows(Vl0))

    def ph_pcgpack(c):
        Ulc, acc = c

        def lanes(A):
            At = A.transpose(1, 2, 0).reshape(dc * dc, C)
            return jnp.pad(At, ((0, 0), (0, c_pad - C)))

        ul_t = lanes(Ulc)
        mi_t = lanes(Minv0)
        b_t = jnp.pad(b0.T, ((0, 0), (0, c_pad - C)))
        return (Ulc * (1.0 + 1e-30),
                acc + (jnp.sum(ul_t[0]) + jnp.sum(mi_t[0])
                       + jnp.sum(b_t[0])) * 1e-30)

    phases["pcg_pack"] = {
        "s": timeit_scan(ph_pcgpack, (Ul0, jnp.zeros((1,), jnp.float32))),
        "per": "lambda_retry",
        "bytes": (C * 81 * 2 + C * dc) * 4 * 2,
    }

    # ---- table ------------------------------------------------------------
    print(f"\n{'phase':<14} {'ms':>9} {'MB':>9} {'GB/s':>7}  per")
    for name, ph in phases.items():
        gbps = ph["bytes"] / ph["s"] / 1e9
        ph["gbps"] = round(gbps, 1)
        ph["ms"] = round(ph["s"] * 1e3, 3)
        print(f"{name:<14} {ph['ms']:>9.3f} {ph['bytes']/1e6:>9.1f} "
              f"{gbps:>7.1f}  {ph['per']}")

    out = {
        "problem": args.problem,
        "device": str(jax.devices()[0]),
        "plan": {"n_pairs": Np, "k_pad": pairs.k_pad, "k_band": pairs.k_band,
                 "band_offsets": len(pairs.band_offsets),
                 "c_pad": pairs.c_pad, "n_segments": pairs.n_segments,
                 "n_heavy_obs": pairs.n_heavy_obs, "banded": pairs.banded},
        "dims": {"C": C, "P": P, "O": O},
        "phases": {k: {kk: vv for kk, vv in v.items() if kk != "s"}
                   for k, v in phases.items()},
    }

    # ---- optional device trace attempt ------------------------------------
    if args.try_trace:
        trace_dir = "/tmp/tpu_ba_trace"
        try:
            with jax.profiler.trace(trace_dir):
                jax.block_until_ready(ph_matvec(x0))
            found = []
            for root, _, files in os.walk(trace_dir):
                found += [f for f in files if "trace" in f or f.endswith(".pb")]
            out["profiler_trace"] = {"ok": bool(found), "files": found[:8]}
        except Exception as e:                          # noqa: BLE001
            out["profiler_trace"] = {"ok": False, "error": repr(e)[:200]}
        print("profiler trace:", out["profiler_trace"])

    path = f"scripts/phase_profile_{args.problem}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
