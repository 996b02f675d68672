"""Fused Pallas kernel: slot-major damped pair products → tile-local grids.

Level 1 of the slot-major band build (tpu_ba/solver/slots.py): for every
point p of a degree bucket (dense slot arrays, points sorted by start
camera) and every slot pair (a, b), a ≤ b,

    T_{cam_a, cam_b} += W_a · (V_p + λ·clip(diag V_p))⁻¹ · W_bᵀ

reduced into a TILE-LOCAL grid keyed by

    local = (cam_a − tile_base_row)·n_off_loc + (cam_b − cam_a)

via the 3-pass-bf16 one-hot MXU reduction. One program per point tile —
no work list, no margin, no read amplification: the local grid is only
~(tile_row_spread + span)·n_off_loc wide, so the one-hot matmul is narrow
regardless of the global band size. Level 2 (a host-sorted permutation +
the standard sorted segment-sum, run by the caller in
tpu_ba/solver/pairs.py:_compact_blocks) folds the concatenated tile grids
into the global (dc², k_band) band layout.

No per-pair index arrays exist anywhere in this path — the measured
~210M-indices/s XLA gather rate (scripts/linearize_input_bench.json) made
the 47M-index pair gather the dominant cost of the Venice solve (474 ms
per linearization, scripts/trace_venice-1778.json fusion.150/151).

jnp oracle: tpu_ba.solver.slots.slot_blocks_jnp (tests/test_slots.py).
Capability parity: the reference's Schur camera-system build
(BASELINE.json:5 "block-sparse J^T J assembly ... Pallas kernels").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ba.kernels.segsum import (_HAVE_PALLAS, _round_up,
                                   resolve_interpret, split3_onehot_dot)

if _HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _make_kernel(dc: int, d: int, n_off_loc: int, width: int,
                 diag_floor: float, diag_ceil: float):
    d2 = dc * dc

    def kernel(base_ref, lam_ref, w_ref, cam_ref, v_ref, m_ref, out_ref):
        k = pl.program_id(0)
        out_ref[:] = jnp.zeros_like(out_ref)

        lam = lam_ref[0, 0]
        V = v_ref[:, :]                                    # (≥9, T)
        d0 = jnp.clip(V[0], diag_floor, diag_ceil)
        d4 = jnp.clip(V[4], diag_floor, diag_ceil)
        d8 = jnp.clip(V[8], diag_floor, diag_ceil)
        a_, b_, c_ = V[0] + lam * d0, V[1], V[2]
        d_, e_, f_ = V[3], V[4] + lam * d4, V[5]
        g_, h_, i_ = V[6], V[7], V[8] + lam * d8
        A = e_ * i_ - f_ * h_
        Bc = f_ * g_ - d_ * i_
        Cc = d_ * h_ - e_ * g_
        det = a_ * A + b_ * Bc + c_ * Cc
        det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
        rdet = 1.0 / det
        inv = [A * rdet, (c_ * h_ - b_ * i_) * rdet, (b_ * f_ - c_ * e_) * rdet,
               Bc * rdet, (a_ * i_ - c_ * g_) * rdet, (c_ * d_ - a_ * f_) * rdet,
               Cc * rdet, (b_ * g_ - a_ * h_) * rdet, (a_ * e_ - b_ * d_) * rdet]

        Wm = [w_ref[:, a, :] * m_ref[a, :] for a in range(d)]
        cams = [cam_ref[a, :] for a in range(d)]
        base = base_ref[k]
        T = cams[0].shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, width), 1)

        for a in range(d):
            Wa = Wm[a]
            M = [sum(Wa[3 * m + a2] * inv[3 * a2 + b2] for a2 in range(3))
                 for m in range(dc) for b2 in range(3)]
            loc_a = (cams[a] - base) * n_off_loc - cams[a]
            for b in range(a, d):
                Wb = Wm[b]
                vals = jnp.stack([
                    sum(M[3 * m + b2] * Wb[3 * n + b2] for b2 in range(3))
                    for m in range(dc) for n in range(dc)
                ])                                          # (d2, T)
                d2_pad = out_ref.shape[0]
                if d2_pad != d2:
                    vals = jnp.concatenate(
                        [vals, jnp.zeros((d2_pad - d2, vals.shape[1]),
                                         vals.dtype)])
                local = loc_a + cams[b]
                onehot = local[:, None] == cols
                out_ref[:, :] += split3_onehot_dot(vals, onehot)

    return kernel


def fused_slot_blocks(Ws, Vs, lam, layout, *, dc: int, diag_floor: float,
                      diag_ceil: float, interpret: bool | None = None):
    """Level-1 outputs for every bucket, concatenated: (d2_pad, L) where L
    = Σ_buckets n_tiles·width (the column order build_slot_layout's level-2
    schedule was built for). ``Ws``/``Vs`` from gather_slot_data."""
    d2 = dc * dc
    d2_pad = _round_up(d2, 8)
    outs = []
    for k, d in enumerate(layout.degrees):
        Wt, Vt = Ws[k], Vs[k]
        camt = layout.slot_cam[k]
        mask = layout.slot_mask[k].astype(Wt.dtype)
        tile = layout.tiles[k]
        width = layout.widths[k]
        v_pad = _round_up(Vt.shape[0], 8)
        if v_pad != Vt.shape[0]:
            Vt = jnp.concatenate(
                [Vt, jnp.zeros((v_pad - Vt.shape[0], Vt.shape[1]), Vt.dtype)])
        m_pad = _round_up(d, 8)
        if m_pad != d:
            mask = jnp.concatenate(
                [mask, jnp.zeros((m_pad - d, mask.shape[1]), mask.dtype)])
            camt = jnp.concatenate(
                [camt, jnp.zeros((m_pad - d, camt.shape[1]), camt.dtype)])
        Pk = Wt.shape[-1]
        n_tiles = Pk // tile
        lam2d = jnp.asarray(lam, Wt.dtype).reshape(1, 1)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda k, tb: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((Wt.shape[0], d, tile),
                             lambda k, tb: (0, 0, k)),
                pl.BlockSpec((m_pad, tile), lambda k, tb: (0, k)),
                pl.BlockSpec((v_pad, tile), lambda k, tb: (0, k)),
                pl.BlockSpec((m_pad, tile), lambda k, tb: (0, k)),
            ],
            out_specs=pl.BlockSpec((d2_pad, width),
                                   lambda k, tb: (0, k)),
        )
        out = pl.pallas_call(
            _make_kernel(dc, d, layout.n_off_loc, width,
                         diag_floor, diag_ceil),
            out_shape=jax.ShapeDtypeStruct((d2_pad, n_tiles * width),
                                           Wt.dtype),
            grid_spec=grid_spec,
            interpret=resolve_interpret(interpret),
        )(layout.tile_base[k], lam2d, Wt, camt, Vt, mask)
        outs.append(out)
    return jnp.concatenate(outs, axis=1)[:d2]


def slot_band_blocks(Ws, Vs, lam, layout, *, dc: int, diag_floor: float,
                     diag_ceil: float, interpret: bool | None = None):
    """Full slot chain: level-1 bucket kernels + level-2 fold into the
    global off-major band grid. Returns (dc², n_out)."""
    from tpu_ba.kernels.segsum import sorted_segment_sum_t

    l1 = fused_slot_blocks(Ws, Vs, lam, layout, dc=dc,
                           diag_floor=diag_floor, diag_ceil=diag_ceil,
                           interpret=interpret)
    pad = layout.l2_len - l1.shape[1]
    if pad:
        l1 = jnp.pad(l1, ((0, 0), (0, pad)))
    l1s = l1[:, layout.l2_perm]
    out = sorted_segment_sum_t(l1s, layout.l2_keys, layout.n_out + 1,
                               plan=layout.l2_plan, interpret=interpret)
    return out[:, : layout.n_out]
