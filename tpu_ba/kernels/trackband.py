"""Fused Pallas kernel: track-major damped pair products → band rows.

The per-λ hot op of the track-major Schur path (tpu_ba/solver/tracks.py):
for every tracked point p (consecutive camera track, start c0, length d)
and every slot pair (a, b), a ≤ b < d,

    T_{c0+a, c0+b} += W_slot_a · (V_p + λ·clip(diag V_p))⁻¹ · W_slot_bᵀ

i.e. band offset b−a, band row c0+a. All products come from SLICES of the
track-major pack (zero gathers — the point of the layout; the legacy path's
pair gather was the measured top cost of the solve, scripts/trace_solve.py)
and reduce through the same 3-pass-bf16 one-hot MXU segment-sum as the
other kernels, keyed by start camera + a (sorted; the work list carries a
(dmax−1)-key margin per chunk for the +a shift).

Output: (dmax·dc², n_chunks·chunk) — row group g = band offset g; the
caller adds group g's [:, :c_pad] into the band grid slot of camera-offset
g. The jnp oracle is tpu_ba.solver.tracks.track_blocks_jnp (tested in
tests/test_tracks.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ba.kernels.segsum import (_HAVE_PALLAS, _round_up,
                                   resolve_interpret, split3_onehot_dot)

if _HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _make_kernel(dc: int, dmax: int, diag_floor: float, diag_ceil: float):
    d2 = dc * dc

    def kernel(chunk_ref, tile_ref, first_ref, lam_ref, keys_ref,
               w_ref, v_ref, m_ref, out_ref):
        k = pl.program_id(0)

        @pl.when(first_ref[k] == 1)
        def _():
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

        # premasked W slots (padding slots/points contribute exact zeros)
        Wm = [w_ref[:, a, :] * m_ref[a, :] for a in range(dmax)]

        keys = keys_ref[0, :]
        chunk = out_ref.shape[1]
        cols = jax.lax.broadcasted_iota(jnp.int32, (keys.shape[0], chunk), 1)
        base = chunk_ref[k] * chunk

        for a in range(dmax):
            Wa = Wm[a]
            M = [sum(Wa[3 * m + a2] * inv[3 * a2 + b2] for a2 in range(3))
                 for m in range(dc) for b2 in range(3)]
            onehot = (keys + a - base)[:, None] == cols
            for b in range(a, dmax):
                off = b - a
                Wb = Wm[b]
                vals = jnp.stack([
                    sum(M[3 * m + b2] * Wb[3 * n + b2] for b2 in range(3))
                    for m in range(dc) for n in range(dc)
                ])                                          # (d2, T)
                out_ref[off * d2:(off + 1) * d2, :] += \
                    split3_onehot_dot(vals, onehot)

    return kernel


def fused_track_blocks(Wt, Vt, lam, layout, *, dc: int, diag_floor: float,
                       diag_ceil: float, interpret: bool | None = None):
    """(dmax·dc², n_chunks·chunk) band-row contributions of the tracked
    points at damping λ. Wt (27, dmax, Pt_pad), Vt (9, Pt_pad) from
    tpu_ba.solver.tracks.gather_track_data."""
    plan = layout.plan
    dmax = layout.dmax
    d2 = dc * dc
    rows_out = _round_up(dmax * d2, 8)
    v_rows = Vt.shape[0]
    v_pad = _round_up(v_rows, 8)
    if v_pad != v_rows:
        Vt = jnp.concatenate(
            [Vt, jnp.zeros((v_pad - v_rows, Vt.shape[1]), Vt.dtype)])
    m_rows = layout.slot_mask.shape[0]
    m_pad = _round_up(m_rows, 8)
    mask = layout.slot_mask.astype(Wt.dtype)
    if m_pad != m_rows:
        mask = jnp.concatenate(
            [mask, jnp.zeros((m_pad - m_rows, mask.shape[1]), mask.dtype)])
    keys2d = layout.keys.reshape(1, -1).astype(jnp.int32)
    lam2d = jnp.asarray(lam, Wt.dtype).reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda k, pc, pt, pf: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, plan.tile), lambda k, pc, pt, pf: (0, pt[k])),
            pl.BlockSpec((Wt.shape[0], dmax, plan.tile),
                         lambda k, pc, pt, pf: (0, 0, pt[k])),
            pl.BlockSpec((v_pad, plan.tile),
                         lambda k, pc, pt, pf: (0, pt[k])),
            pl.BlockSpec((m_pad, plan.tile),
                         lambda k, pc, pt, pf: (0, pt[k])),
        ],
        out_specs=pl.BlockSpec((rows_out, plan.chunk),
                               lambda k, pc, pt, pf: (0, pc[k])),
    )
    out = pl.pallas_call(
        _make_kernel(dc, dmax, diag_floor, diag_ceil),
        out_shape=jax.ShapeDtypeStruct((rows_out, plan.n_chunks * plan.chunk),
                                       Wt.dtype),
        grid_spec=grid_spec,
        interpret=resolve_interpret(interpret),
    )(plan.prog_chunk, plan.prog_tile, plan.prog_first,
      lam2d, keys2d, Wt, Vt, mask)
    return out[:dmax * d2]
