#!/usr/bin/env python
"""Localize the f32 accuracy gap: run LM with selected stages in f32 vs f64.

Modes (CPU, x64 enabled so f64 is real):
  full64      — everything f64 (the golden)
  full32      — everything f32 (mirrors the TPU run)
  solve32     — linearize+assemble+cost in f64, linear solve in f32
  lin32       — linearize/assemble in f32, everything else f64
"""
from __future__ import annotations

import argparse
import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from tpu_ba.core import LMConfig
from tpu_ba.io.bal import make_bal_like_problem
from tpu_ba.solver.lm import solve
from tpu_ba.solver import pairs as pairs_mod

ap = argparse.ArgumentParser()
ap.add_argument("--problem", default="ladybug-49")
ap.add_argument("--max-iters", type=int, default=50)
ap.add_argument("--modes", default="full32,solve32")
args = ap.parse_args()

golden = json.load(open(f"data/goldens/{args.problem}.json"))
print("golden f64 final:", golden["final_cost"])

cfg = LMConfig(max_iters=args.max_iters, linear_solver="schur_sparse",
               cg_max_iters=50, cg_tol=1e-2, init_lambda=1e-4)


def run(dtype):
    problem, _ = make_bal_like_problem(args.problem, dtype=dtype)
    res = solve(problem, cfg)
    return float(res.cost), int(res.accepted), int(res.iterations)


for mode in args.modes.split(","):
    if mode == "full64":
        c, acc, it = run(np.float64)
    elif mode == "full32":
        c, acc, it = run(np.float32)
    elif mode == "solve32":
        # patch solve_schur_sparse to downcast its inputs and upcast outputs
        orig = pairs_mod.solve_schur_sparse

        def solve32(B, lam, pairs, pair_data=None, **kw):
            B32 = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, B)
            pd32 = None
            if pair_data is not None:
                pd32 = jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and x.dtype == jnp.float64 else x,
                    pair_data)
            lam32 = jnp.asarray(lam, jnp.float32)
            dxc, dxp, cg, ok = orig(B32, lam32, pairs, pd32, **kw)
            return (dxc.astype(jnp.float64), dxp.astype(jnp.float64), cg, ok)

        pairs_mod.solve_schur_sparse = solve32
        try:
            c, acc, it = run(np.float64)
        finally:
            pairs_mod.solve_schur_sparse = orig
    elif mode == "comp_dots":
        # f32 everything, CG dot products accumulated in f64 — the upper
        # bound of a two-float compensated-dot kernel (VERDICT r4 ask #8)
        from tpu_ba.solver import pcg as pcg_mod

        pcg_mod.DOT_ACCUM_DTYPE = jnp.float64
        try:
            c, acc, it = run(np.float32)
        finally:
            pcg_mod.DOT_ACCUM_DTYPE = None
    elif mode == "comp_seg":
        # f32 everything, JᵀJ/JTr assembly segment sums accumulated in f64
        # — the upper bound of compensated segment-sum kernels
        from tpu_ba.solver import normal as normal_mod

        orig_as = normal_mod.assemble

        def assemble64(r, Jc, Jp, ci, pi, C, P, kind, scale, mask,
                       axis_name=None, plans=None):
            B = orig_as(r.astype(jnp.float64), Jc.astype(jnp.float64),
                        Jp.astype(jnp.float64), ci, pi, C, P, kind, scale,
                        mask, axis_name, plans)
            return jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, B)

        normal_mod.assemble = assemble64
        import tpu_ba.solver.lm as lm_mod

        orig_lm_as = lm_mod.assemble
        lm_mod.assemble = assemble64
        try:
            c, acc, it = run(np.float32)
        finally:
            normal_mod.assemble = orig_as
            lm_mod.assemble = orig_lm_as
    elif mode == "comp_both":
        from tpu_ba.solver import normal as normal_mod
        from tpu_ba.solver import pcg as pcg_mod

        orig_as = normal_mod.assemble

        def assemble64(r, Jc, Jp, ci, pi, C, P, kind, scale, mask,
                       axis_name=None, plans=None):
            B = orig_as(r.astype(jnp.float64), Jc.astype(jnp.float64),
                        Jp.astype(jnp.float64), ci, pi, C, P, kind, scale,
                        mask, axis_name, plans)
            return jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, B)

        import tpu_ba.solver.lm as lm_mod

        orig_lm_as = lm_mod.assemble
        normal_mod.assemble = assemble64
        lm_mod.assemble = assemble64
        pcg_mod.DOT_ACCUM_DTYPE = jnp.float64
        try:
            c, acc, it = run(np.float32)
        finally:
            normal_mod.assemble = orig_as
            lm_mod.assemble = orig_lm_as
            pcg_mod.DOT_ACCUM_DTYPE = None
    else:
        raise SystemExit(f"unknown mode {mode}")
    gap = (c - golden["final_cost"]) / golden["final_cost"] * 100
    print(f"{mode:8s} final={c:.1f} accepted={acc}/{it} gap_vs_f64={gap:+.3f}%")
