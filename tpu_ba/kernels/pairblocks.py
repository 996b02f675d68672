"""Fused Pallas kernel: damped pair products + compact segment reduction.

The per-λ hot op of the explicit block-sparse Schur path
(tpu_ba/solver/pairs.py): for every covisibility pair (i, j) sharing point p,

    vals[:, k] = W_i · (V_p + λ·clip(diag V_p))⁻¹ · W_jᵀ        (dc×dc block)

reduced by compact camera-pair segment. Round 1 materialized the (dc², Np)
pair products in HBM between the product map and the segment reduction —
at ladybug-1723 that is ~1 GB written + re-read per λ-retry, measured at
65 ms. This kernel computes the products in VMEM from the λ-free packed
pair data and feeds them straight into the one-hot MXU reduction: HBM
traffic drops to one read of ``packed`` (+ the compact output), the
roofline for this op.

Same work-list schedule as tpu_ba/kernels/segsum.py (chunks of CHUNK
segments × observation tiles, scalar-prefetched (chunk, tile) programs);
the jnp path (_pair_products_t + segment_sum) remains the oracle
(tested in tests/test_kernels.py / test_pairs.py).

Capability parity: the Schur-complement camera-system build of the
reference (BASELINE.json:5 "block-sparse JᵀJ assembly … Pallas kernels";
SURVEY.md §2.2 N7 "fused residual+Jacobian eval" family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ba.kernels.segsum import (_HAVE_PALLAS, SegsumPlan, _round_up,
                                   resolve_interpret)

if _HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _make_kernel(dc: int, diag_floor: float, diag_ceil: float):
    d2 = dc * dc

    def kernel(chunk_ref, tile_ref, first_ref, lam_ref, keys_ref, packed_ref,
               out_ref):
        k = pl.program_id(0)

        @pl.when(first_ref[k] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        lam = lam_ref[0, 0]
        Wi = packed_ref[0:3 * dc, :]                       # rows 3m+a
        Wj = packed_ref[3 * dc:6 * dc, :]
        V = packed_ref[6 * dc:6 * dc + 9, :]               # rows 3a+b

        # damp: V_λ = V + λ·clip(diag V) on the diagonal
        d0 = jnp.clip(V[0], diag_floor, diag_ceil)
        d4 = jnp.clip(V[4], diag_floor, diag_ceil)
        d8 = jnp.clip(V[8], diag_floor, diag_ceil)
        a, b, c = V[0] + lam * d0, V[1], V[2]
        d, e, f = V[3], V[4] + lam * d4, V[5]
        g, h, i = V[6], V[7], V[8] + lam * d8

        # adjugate inverse (matches tpu_ba.solver.schur.inv3x3_rows)
        A = e * i - f * h
        Bc = f * g - d * i
        Cc = d * h - e * g
        det = a * A + b * Bc + c * Cc
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        rdet = 1.0 / det
        inv = [A * rdet, (c * h - b * i) * rdet, (b * f - c * e) * rdet,
               Bc * rdet, (a * i - c * g) * rdet, (c * d - a * f) * rdet,
               Cc * rdet, (b * g - a * h) * rdet, (a * e - b * d) * rdet]

        # M[3m+b] = Σ_a Wi[3m+a]·Vinv[3a+b];  vals[dc·m+n] = Σ_b M[3m+b]·Wj[3n+b]
        rows = []
        for m in range(dc):
            M = [sum(Wi[3 * m + a2] * inv[3 * a2 + b2] for a2 in range(3))
                 for b2 in range(3)]
            for n in range(dc):
                rows.append(sum(M[b2] * Wj[3 * n + b2] for b2 in range(3)))
        vals = jnp.stack(rows)                              # (dc², T)
        d2_pad = _round_up(d2, 8)
        if d2_pad != d2:
            vals = jnp.concatenate(
                [vals, jnp.zeros((d2_pad - d2, vals.shape[1]), vals.dtype)])

        keys = keys_ref[0, :]
        chunk = out_ref.shape[1]
        local = keys - chunk_ref[k] * chunk
        cols = jax.lax.broadcasted_iota(jnp.int32, (keys.shape[0], chunk), 1)
        onehot = local[:, None] == cols
        # 3-pass bf16 split ≡ HIGHEST for one-hot operands at half the MXU
        # passes — see tpu_ba/kernels/segsum.py:split3_onehot_dot
        from tpu_ba.kernels.segsum import split3_onehot_dot

        out_ref[:, :] += split3_onehot_dot(vals, onehot)

    return kernel


def fused_pair_blocks(packed, keys, lam, n_out: int, plan: SegsumPlan, *,
                      dc: int, diag_floor: float, diag_ceil: float,
                      interpret: bool | None = None):
    """blk (dc², n_out): Σ_pairs W_i V_λ⁻¹ W_jᵀ by compact segment key.

    ``packed`` (6·dc+9, Np) is the λ-free pair gather
    (tpu_ba.solver.pairs.precompute_pair_data), ``keys`` the sorted compact
    segment ids, ``plan`` their work-list schedule. Padding-pair handling is
    the caller's contract (trash segment zeroed afterwards).
    """
    rows, Np = packed.shape
    assert rows == 6 * dc + 9, (rows, dc)
    rows_pad = _round_up(rows, 8)
    if rows_pad != rows:
        packed = jnp.concatenate(
            [packed, jnp.zeros((rows_pad - rows, Np), packed.dtype)])
    d2_pad = _round_up(dc * dc, 8)
    keys2d = keys.reshape(1, -1).astype(jnp.int32)
    lam2d = jnp.asarray(lam, packed.dtype).reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k, pc, pt, pf: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, plan.tile), lambda k, pc, pt, pf: (0, pt[k])),
            pl.BlockSpec((rows_pad, plan.tile),
                         lambda k, pc, pt, pf: (0, pt[k])),
        ],
        out_specs=pl.BlockSpec((d2_pad, plan.chunk),
                               lambda k, pc, pt, pf: (0, pc[k])),
    )
    out = pl.pallas_call(
        _make_kernel(dc, diag_floor, diag_ceil),
        out_shape=jax.ShapeDtypeStruct((d2_pad, plan.n_chunks * plan.chunk),
                                       packed.dtype),
        grid_spec=grid_spec,
        interpret=resolve_interpret(interpret),
    )(plan.prog_chunk, plan.prog_tile, plan.prog_first, lam2d, keys2d, packed)
    return out[:dc * dc, :n_out]
