"""Fused Pallas kernel: residual + analytic Jacobian + robust IRLS + assembly.

One pass over the observation axis computes, per 2048-obs tile, entirely in
VMEM:

    r = π(cam, X) − uv  (BAL 9-param model, Rodrigues rotation)
    Jc (2×9), Jp (2×3)  (closed-form chain — tpu_ba/jacobians/analytic.py)
    IRLS weighting       (√ρ′(|r|²) scaling, Huber/Cauchy/arctan)
    W  = Jcᵀ Jp          (27 rows, written out — feeds the pair gather)
    VtV = Jpᵀ Jp, gp = Jpᵀ r, ρ  (13 rows, written out — point-side reduce)
    [U = Jcᵀ Jc ; gc = Jcᵀ r] @ onehot(cam)  (90 rows, reduced in-kernel by
                                              camera chunk on the MXU)

Round 1 ran this as vmap(jac) → XLA fusion → segment sums: measured
75 ms (jacobian) + 36 ms (assembly) per linearization at ladybug-1723 —
dominated by tiny batched-matmul relayouts and scatter traffic, ~20× above
the HBM roofline for the ~180 MB this pass actually has to move
(scripts/pair_profile.py). The fused kernel is the SURVEY.md §2.2 N7
"fused residual+Jacobian eval" deliverable (VERDICT round 1, next #6).

Oracle: tpu_ba.jacobians.analytic.jacobian_blocks_bal +
tpu_ba.solver.normal.assemble (CPU fp64 / interpret-mode tests).

Reference parity: the per-observation residual/Jacobian/normal-equation
assembly of the reference LM loop (BASELINE.json:5 "reprojection-error
evaluation, analytic Jacobian construction (camera + point blocks)";
SURVEY.md §2.1 R1/R2/R4 — reference mount empty, see SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ba.kernels.segsum import (_HAVE_PALLAS, SegsumPlan, _round_up,
                                   resolve_interpret)
from tpu_ba.residuals.robust import robust_rho, robust_weight

if _HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

_SMALL_THETA2 = 1e-12

# packed input rows
_IN_ROWS = 16      # cam(9) | X(3) | uv(2) | mask(1) | pad(1)
# packed per-obs output rows
OBS_W0 = 0         # W rows 0..26  (3m+n)
OBS_VTV = 27       # VtV rows 27..35 (3m+n)
OBS_GP = 36        # gp rows 36..38
OBS_RHO = 39       # robust cost per obs
_OBS_ROWS = 48
# camera-side reduction rows
CAM_ROWS = 90      # UtU (81, row 9m+n) | gc (9)
_CAM_PAD = 96


def _projection_core(in_ref):
    """Shared per-observation BAL projection + residual chain on the packed
    16-row input layout — used by BOTH the full linearize kernel and the
    trial-cost kernel so the projection model (Rodrigues, z-guard,
    distortion) can never silently diverge between cost and linearization
    [ADVICE r3 low #4]. Returns every intermediate the Jacobian chain
    reuses."""
    c = [in_ref[i, :] for i in range(9)]           # camera params
    X = [in_ref[9 + i, :] for i in range(3)]       # point
    uv = [in_ref[12, :], in_ref[13, :]]
    mk = in_ref[14, :]                             # 1.0 valid / 0.0 pad
    dt = mk.dtype

    aa0, aa1, aa2 = c[0], c[1], c[2]
    f, k1, k2 = c[6], c[7], c[8]

    # Rodrigues R = I + A·K + B·(aa aaᵀ − θ²I), Taylor-guarded
    t2 = aa0 * aa0 + aa1 * aa1 + aa2 * aa2
    small = t2 < _SMALL_THETA2
    th = jnp.sqrt(jnp.where(small, jnp.ones_like(t2), t2))
    A = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    Bc = jnp.where(small, 0.5 - t2 / 24.0,
                   (1.0 - jnp.cos(th))
                   / jnp.where(small, jnp.ones_like(t2), t2))
    K = [[jnp.zeros_like(t2), -aa2, aa1],
         [aa2, jnp.zeros_like(t2), -aa0],
         [-aa1, aa0, jnp.zeros_like(t2)]]
    aav = [aa0, aa1, aa2]
    R = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            delta = 1.0 if i == j else 0.0
            R[i][j] = (delta + A * K[i][j]
                       + Bc * (aav[i] * aav[j]
                               - (t2 if i == j else 0.0) * 1.0))

    # P = R X + t
    P = [sum(R[i][j] * X[j] for j in range(3)) + c[3 + i] for i in range(3)]
    z = P[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, jnp.asarray(1e-12, dt), z)
    inv_z = 1.0 / z_safe
    p0, p1 = -P[0] * inv_z, -P[1] * inv_z
    s = p0 * p0 + p1 * p1
    d = 1.0 + s * (k1 + s * k2)
    u0, u1 = f * d * p0, f * d * p1
    r0 = (u0 - uv[0]) * mk
    r1 = (u1 - uv[1]) * mk
    return dict(X=X, mk=mk, dt=dt, f=f, k1=k1, k2=k2,
                t2=t2, small=small, K=K, aav=aav, R=R,
                inv_z=inv_z, p0=p0, p1=p1, s=s, d=d, r0=r0, r1=r1)


def _make_kernel(robust_kind: int, robust_scale: float,
                 freeze_cols: tuple = ()):
    def kernel(chunk_ref, tile_ref, first_ref, keys_ref, in_ref,
               cam_out_ref, obs_out_ref):
        k = pl.program_id(0)

        @pl.when(first_ref[k] == 1)
        def _():
            cam_out_ref[:] = jnp.zeros_like(cam_out_ref)

        pc = _projection_core(in_ref)
        X, mk, dt = pc["X"], pc["mk"], pc["dt"]
        f, k1, k2 = pc["f"], pc["k1"], pc["k2"]
        t2, small, K, aav, R = (pc["t2"], pc["small"], pc["K"], pc["aav"],
                                pc["R"])
        inv_z, p0, p1, s, d = (pc["inv_z"], pc["p0"], pc["p1"], pc["s"],
                               pc["d"])
        r0, r1 = pc["r0"], pc["r1"]

        # robust IRLS: ρ and √ρ′ on the masked residual
        sr = r0 * r0 + r1 * r1
        rho = robust_rho(robust_kind, sr, robust_scale, pallas=True) * mk
        sw = jnp.sqrt(robust_weight(robust_kind, sr, robust_scale)) * mk

        # du/dp (2×2), dp/dP (2×3) → du/dP (2×3)
        g2 = 2.0 * (k1 + 2.0 * k2 * s)
        pvec = [p0, p1]
        du_dp = [[f * (d * (1.0 if a == b else 0.0) + g2 * pvec[a] * pvec[b])
                  for b in range(2)] for a in range(2)]
        # dp_dP[a][j] = -δ_aj/z (j<2);  dp_dP[a][2] = -p_a/z
        du_dP = [[-(du_dp[a][j]) * inv_z for j in range(2)] for a in range(2)]
        for a in range(2):
            du_dP[a].append(-(du_dp[a][0] * p0 + du_dp[a][1] * p1) * inv_z)

        # dP/daa: Gallego–Yezzi with −[X]× fallback
        t2s = jnp.where(small, jnp.ones_like(t2), t2)
        # core = (aa aaᵀ + (Rᵀ − I)K)/θ²
        core = [[(aav[i] * aav[j]
                  + sum((R[l][i] - (1.0 if l == i else 0.0)) * K[l][j]
                        for l in range(3))) / t2s
                 for j in range(3)] for i in range(3)]
        Xk = [[jnp.zeros_like(t2), -X[2], X[1]],
              [X[2], jnp.zeros_like(t2), -X[0]],
              [-X[1], X[0], jnp.zeros_like(t2)]]
        RXk = [[sum(R[i][l] * Xk[l][j] for l in range(3)) for j in range(3)]
               for i in range(3)]
        dPda = [[jnp.where(small, -Xk[i][j],
                           -sum(RXk[i][l] * core[l][j] for l in range(3)))
                 for j in range(3)] for i in range(3)]

        # Jc (2×9) and Jp (2×3), IRLS+mask weighted
        Jc = [[None] * 9 for _ in range(2)]
        Jp = [[None] * 3 for _ in range(2)]
        for a in range(2):
            for j in range(3):
                Jc[a][j] = sum(du_dP[a][l] * dPda[l][j] for l in range(3)) * sw
                Jc[a][3 + j] = du_dP[a][j] * sw
                Jp[a][j] = sum(du_dP[a][l] * R[l][j] for l in range(3)) * sw
            Jc[a][6] = d * pvec[a] * sw
            Jc[a][7] = f * s * pvec[a] * sw
            Jc[a][8] = f * s * s * pvec[a] * sw
            for col in freeze_cols:     # frozen columns: exact zero J ⇒ δ=0
                Jc[a][col] = jnp.zeros_like(sw)
        r0 = r0 * sw
        r1 = r1 * sw

        # per-obs outputs: W (27), VtV (9), gp (3), ρ (1)
        obs_rows = []
        for m in range(9):
            for n in range(3):
                obs_rows.append(Jc[0][m] * Jp[0][n] + Jc[1][m] * Jp[1][n])
        for m in range(3):
            for n in range(3):
                obs_rows.append(Jp[0][m] * Jp[0][n] + Jp[1][m] * Jp[1][n])
        for m in range(3):
            obs_rows.append(Jp[0][m] * r0 + Jp[1][m] * r1)
        obs_rows.append(rho)
        while len(obs_rows) < _OBS_ROWS:
            obs_rows.append(jnp.zeros_like(rho))
        obs_out_ref[:, :] = jnp.stack(obs_rows)

        # camera-side reduction rows: UtU (81) + gc (9) → onehot matmul
        cam_rows = []
        for m in range(9):
            for n in range(9):
                cam_rows.append(Jc[0][m] * Jc[0][n] + Jc[1][m] * Jc[1][n])
        for m in range(9):
            cam_rows.append(Jc[0][m] * r0 + Jc[1][m] * r1)
        while len(cam_rows) < _CAM_PAD:
            cam_rows.append(jnp.zeros_like(rho))
        vals = jnp.stack(cam_rows)                       # (96, T)

        keys = keys_ref[0, :]
        chunk = cam_out_ref.shape[1]
        local = keys - chunk_ref[k] * chunk
        cols = jax.lax.broadcasted_iota(jnp.int32, (keys.shape[0], chunk), 1)
        onehot = local[:, None] == cols
        # 3-pass bf16 split ≡ HIGHEST for one-hot operands at half the MXU
        # passes — see tpu_ba/kernels/segsum.py:split3_onehot_dot
        from tpu_ba.kernels.segsum import split3_onehot_dot

        cam_out_ref[:, :] += split3_onehot_dot(vals, onehot)

    return kernel


def fused_linearize_assemble(cameras, points, obs_2d, cam_idx, pt_idx, mask,
                             plan: SegsumPlan, *, robust_kind: int = 0,
                             robust_scale: float = 1.0,
                             freeze_cols: tuple = (),
                             interpret: bool | None = None):
    """One fused pass: (cameras, points) → (U, gc, W, obs_payload).

    Returns:
      U   (C, 9, 9)  camera diagonal blocks of the IRLS-weighted JᵀJ
      gc  (C, 9)     camera gradient
      W   (27, O)    per-observation coupling blocks, lane-major
      pt_vals (13, O) rows: VtV (9, 3m+n), gp (3), ρ (1) — point-side
                     payload for pt_segsum + cost
    ``plan`` is the camera-keyed work list (observations camera-sorted).
    """
    C = cameras.shape[0]
    O = obs_2d.shape[0]
    dt = cameras.dtype
    # input gathers: the row-gather-then-transpose spelling measured FASTER
    # end-to-end than the lane-axis alternative cameras.T[:, idx]
    # (26.8 vs 23.7 LM it/s at ladybug-1723, round 4) — XLA fuses this
    # transpose into the pack concatenate, while the (9, C) lane gather
    # forced a separate relayout. Keep the original spelling.
    camg = cameras[cam_idx].T                            # (9, O)
    ptg = points[pt_idx].T                               # (3, O)
    packed = jnp.concatenate([
        camg, ptg, obs_2d.T, mask.astype(dt)[None, :],
        jnp.zeros((_IN_ROWS - 15, O), dt)], axis=0)      # (16, O)
    keys2d = cam_idx.reshape(1, -1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec((1, plan.tile), lambda k, pc, pt, pf: (0, pt[k])),
            pl.BlockSpec((_IN_ROWS, plan.tile),
                         lambda k, pc, pt, pf: (0, pt[k])),
        ],
        out_specs=[
            pl.BlockSpec((_CAM_PAD, plan.chunk),
                         lambda k, pc, pt, pf: (0, pc[k])),
            pl.BlockSpec((_OBS_ROWS, plan.tile),
                         lambda k, pc, pt, pf: (0, pt[k])),
        ],
    )
    cam_out, obs_out = pl.pallas_call(
        _make_kernel(robust_kind, robust_scale, tuple(freeze_cols)),
        out_shape=[
            jax.ShapeDtypeStruct((_CAM_PAD, plan.n_chunks * plan.chunk), dt),
            jax.ShapeDtypeStruct((_OBS_ROWS, O), dt),
        ],
        grid_spec=grid_spec,
        interpret=resolve_interpret(interpret),
    )(plan.prog_chunk, plan.prog_tile, plan.prog_first, keys2d, packed)

    cam_out = cam_out[:CAM_ROWS, :C]                     # (90, C)
    U = cam_out[:81].reshape(9, 9, C).transpose(2, 0, 1)
    gc = cam_out[81:].T                                  # (C, 9)
    W = obs_out[OBS_W0:OBS_W0 + 27]
    pt_vals = obs_out[OBS_VTV:OBS_RHO + 1]               # (13, O)
    return U, gc, W, pt_vals


def _make_cost_kernel(robust_kind: int, robust_scale: float):
    """Residual + robust-ρ only — the trial-cost evaluation of the λ-retry
    loop (cost_fn in tpu_ba/solver/lm.py). The XLA op-graph version spent
    ~3.5 ms per evaluation at ladybug-1723 (round-3 phase profile), almost
    all of it op overhead and gather traffic around ~11 MB of real work."""

    def kernel(in_ref, out_ref):
        pc = _projection_core(in_ref)      # the SAME chain the linearize
        r0, r1, mk, dt = pc["r0"], pc["r1"], pc["mk"], pc["dt"]
        sr = r0 * r0 + r1 * r1
        rho = robust_rho(robust_kind, sr, robust_scale, pallas=True) * mk

        # Mosaic rejects scalar stores to VMEM ("Cannot store scalars to
        # VMEM", jax/_src/pallas/mosaic/lowering.py) — write the tile total
        # into lane (0, 0) of a full (8, 128) block via an iota select
        # instead. Host-side jnp.sum(out) recovers Σρ exactly.
        total = jnp.sum(rho)
        rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
        out_ref[:, :] = jnp.where((rows == 0) & (cols == 0), total,
                                  jnp.zeros(out_ref.shape, dt))

    return kernel


def fused_cost(cameras, points, obs_2d, cam_idx, pt_idx, mask, *,
               robust_kind: int = 0, robust_scale: float = 1.0,
               tile: int = 2048, interpret: bool | None = None):
    """Robust reprojection cost ½Σρ in one Pallas pass (BAL model).

    Oracle: residuals_bal + robust_rho (tested in tests/test_kernels.py)."""
    O = obs_2d.shape[0]
    dt = cameras.dtype
    camg = cameras[cam_idx].T
    ptg = points[pt_idx].T
    packed = jnp.concatenate([
        camg, ptg, obs_2d.T, mask.astype(dt)[None, :],
        jnp.zeros((_IN_ROWS - 15, O), dt)], axis=0)
    O_pad = _round_up(O, tile)
    if O_pad != O:
        packed = jnp.pad(packed, ((0, 0), (0, O_pad - O)))  # mask row 0 ⇒ ρ 0
    grid = O_pad // tile

    out = pl.pallas_call(
        _make_cost_kernel(robust_kind, robust_scale),
        out_shape=jax.ShapeDtypeStruct((8, 128 * grid), dt),
        grid=(grid,),
        in_specs=[pl.BlockSpec((_IN_ROWS, tile), lambda k: (0, k))],
        out_specs=pl.BlockSpec((8, 128), lambda k: (0, k)),
        interpret=resolve_interpret(interpret),
    )(packed)
    return 0.5 * jnp.sum(out)
