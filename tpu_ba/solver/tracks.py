"""Track-major layout: gather-free Schur band assembly for consecutive tracks.

Round-3 device tracing (scripts/trace_solve.py) showed the λ-free pair
gather — packing W into covisibility-pair order, ~470 MB of random access
per linearization — was the single largest cost of the production solve
(two ~18 ms fusions per linearization at ladybug-1723). The covisibility
pairs of a *consecutive* camera track are fully determined by the track's
start camera and length: the pair (slot a, slot b) of a track starting at
camera c0 contributes exactly the band block (offset b−a, row c0+a). So
instead of enumerating pairs (quadratic) and gathering W per pair, lay W
out TRACK-MAJOR once per linearization — one O-sized permutation gather
into (27, dmax, Pt) slot order — and let the per-λ kernel
(tpu_ba/kernels/trackband.py) produce every pair product from *slices*,
reducing into band rows with the same one-hot MXU segment-sum machinery,
keyed by start camera (sorted, so the work-list applies).

Points whose tracks are not consecutive (loop-closure wraparound, repeated
cameras, very long tracks) fall back to the legacy pair enumeration — for
trajectory-style BAL problems that is ≲1% of points, so the legacy packed
gather shrinks from ~470 MB to a few MB.

Capability parity: part of the reference's Schur-complement camera-system
build (BASELINE.json:5 "block-sparse J^T J assembly ... Pallas kernels");
the layout is new TPU-first design, not mirrored from the (MATLAB, empty
mount — SURVEY.md §0) reference.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["slot_idx", "slot_mask", "vperm", "keys", "plan"],
    meta_fields=["dmax", "n_tracked", "pt_pad", "n_out"],
)
@dataclasses.dataclass(frozen=True)
class TrackLayout:
    """Static track-major schedule for the band build.

    ``slot_idx[a, p]`` is the observation index of the a-th (camera-order)
    observation of tracked point p (points in start-camera-sorted order);
    ``slot_mask[a, p]`` is 1.0 where a < track length (0.0 ⇒ the slot's W
    must be treated as zero); ``vperm[p]`` is the original point id (for the
    V gather); ``keys[p]`` is the start camera (sorted ascending; padding
    rows carry n_cameras−1 with all-zero masks). ``plan`` is the one-hot
    segment-sum work list over ``keys`` with a (dmax−1)-key margin per
    chunk: slot pair (a, b) reduces by key+a, so a chunk must also see the
    tiles holding keys up to dmax−1 below its range.
    """

    slot_idx: jax.Array    # (dmax, Pt_pad) int32
    slot_mask: jax.Array   # (dmax, Pt_pad) float32
    vperm: jax.Array       # (Pt_pad,) int32
    keys: jax.Array        # (Pt_pad,) int32, sorted
    plan: object           # SegsumPlan (margin-extended)
    dmax: int
    n_tracked: int
    pt_pad: int
    n_out: int             # c_pad — width of one band row


def split_tracks(cam_idx, pt_idx, n_obs: int, n_points: int,
                 *, dmax_cap: int = 8):
    """Classify points: tracked (consecutive cameras, length ≤ dmax_cap)
    vs legacy. Returns (tracked_mask (P,), order, starts, deg) where
    ``order`` sorts observations stably by point and ``starts``/``deg``
    index each point's run in that order."""
    ci = np.asarray(cam_idx)[:n_obs].astype(np.int64)
    pi = np.asarray(pt_idx)[:n_obs].astype(np.int64)
    # the span test below (cam_last − cam_first == deg−1 ⇔ consecutive) is
    # sound only when observations are camera-sorted within each point —
    # guaranteed by the global camera sort (make_problem sort=True). With
    # unsorted input (e.g. make_problem(..., sort=False)) an order like
    # [1,3,2,4] would silently pass and produce wrong band blocks, so
    # verify the invariant cheaply and fall back to legacy pairs otherwise
    # [ADVICE r3 low #2].
    if ci.size and not np.all(np.diff(ci) >= 0):
        none = np.zeros(n_points, bool)
        order = np.argsort(pi, kind="stable").astype(np.int64)
        deg = np.bincount(pi[order], minlength=n_points)
        starts = np.concatenate([[0], np.cumsum(deg)])[:-1]
        return none, order, starts, deg
    order = np.argsort(pi, kind="stable").astype(np.int64)
    pis = pi[order]
    deg = np.bincount(pis, minlength=n_points)
    starts = np.concatenate([[0], np.cumsum(deg)])[:-1]
    cis = ci[order]
    has = deg > 0
    cam_first = np.zeros(n_points, np.int64)
    cam_last = np.zeros(n_points, np.int64)
    cam_first[has] = cis[starts[has]]
    cam_last[has] = cis[starts[has] + deg[has] - 1]
    # observations are camera-sorted globally, so within a point the camera
    # sequence is ascending; distinct cameras + span == deg−1 ⇔ consecutive
    # (any repeated camera shrinks the span below deg−1 ⇒ legacy)
    tracked = has & (deg <= dmax_cap) & (cam_last - cam_first == deg - 1)
    return tracked, order, starts, deg


def build_track_layout(cam_idx, pt_idx, n_obs: int, n_cameras: int,
                       n_points: int, c_pad: int, *, dmax_cap: int = 8,
                       tile: int = 2048, with_kernel_plans: bool = True):
    """Build the TrackLayout (or None if no point is tracked)."""
    tracked, order, starts, deg = split_tracks(
        cam_idx, pt_idx, n_obs, n_points, dmax_cap=dmax_cap)
    ptids = np.nonzero(tracked)[0]
    if ptids.size == 0:
        return None
    ci = np.asarray(cam_idx)[:n_obs].astype(np.int64)
    c0 = ci[order[starts[ptids]]]
    sort = np.argsort(c0, kind="stable")
    ptids = ptids[sort]
    c0 = c0[sort]
    d = deg[ptids]
    dmax = int(d.max())
    if n_cameras + dmax > c_pad:
        raise ValueError(
            f"c_pad {c_pad} too small for key shift: need ≥ "
            f"{n_cameras + dmax} (build the band grid with margin)")

    nt = int(ptids.size)
    pt_pad = _round_up(nt, tile)
    pad = pt_pad - nt

    slot_idx = np.zeros((dmax, pt_pad), np.int64)
    slot_mask = np.zeros((dmax, pt_pad), np.float32)
    base = starts[ptids]
    for a in range(dmax):
        ok = d > a
        slot_idx[a, :nt][ok] = order[base[ok] + a]
        slot_mask[a, :nt][ok] = 1.0
    keys = np.concatenate([c0, np.full(pad, n_cameras - 1, np.int64)])
    vperm = np.concatenate([ptids, np.zeros(pad, np.int64)])

    plan = None
    if with_kernel_plans:
        plan = _build_margin_plan(keys, c_pad, tile=tile, margin=dmax - 1)

    return TrackLayout(
        slot_idx=jnp.asarray(slot_idx.astype(np.int32)),
        slot_mask=jnp.asarray(slot_mask),
        vperm=jnp.asarray(vperm.astype(np.int32)),
        keys=jnp.asarray(keys.astype(np.int32)),
        plan=plan,
        dmax=dmax, n_tracked=nt, pt_pad=pt_pad, n_out=int(c_pad),
    )


def _build_margin_plan(keys: np.ndarray, n_out: int, *, tile: int,
                       margin: int, chunk: int | None = None):
    """SegsumPlan over sorted ``keys`` whose per-chunk tile range also
    covers keys ≥ lo − margin (the slot shift key+a may move a key up to
    ``margin`` segments forward, across a chunk boundary)."""
    from tpu_ba.kernels.segsum import SegsumPlan, _round_up as ru

    keys = np.asarray(keys)
    O = keys.shape[0]
    if O % tile != 0:
        raise ValueError(f"{O} not a multiple of tile {tile}")
    if np.any(np.diff(keys) < 0):
        raise ValueError("keys must be sorted ascending")
    if chunk is None:
        avg_per_seg = O / max(n_out, 1)
        chunk = int(min(2048, max(128,
                                  ru(int(2.0 * tile / max(avg_per_seg, 1e-9)),
                                     128))))
    n_chunks = -(-n_out // chunk)
    n_tiles = O // tile

    lo = np.arange(n_chunks) * chunk
    hi = np.minimum(lo + chunk, n_out)
    first_obs = np.searchsorted(keys, np.maximum(lo - margin, 0), side="left")
    last_obs = np.searchsorted(keys, hi - 1, side="right") - 1
    empty = last_obs < first_obs
    first_tile = np.minimum(first_obs // tile, n_tiles - 1)
    last_tile = np.where(empty, first_tile,
                         np.maximum(last_obs, first_obs) // tile)
    counts = (last_tile - first_tile + 1).astype(np.int64)
    G = int(counts.sum())
    prog_chunk = np.repeat(np.arange(n_chunks, dtype=np.int64), counts)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    prog_tile = (np.arange(G, dtype=np.int64) - offsets[prog_chunk]
                 + first_tile[prog_chunk])
    prog_first = np.zeros(G, np.int64)
    prog_first[offsets] = 1
    return SegsumPlan(
        prog_chunk=jnp.asarray(prog_chunk.astype(np.int32)),
        prog_tile=jnp.asarray(prog_tile.astype(np.int32)),
        prog_first=jnp.asarray(prog_first.astype(np.int32)),
        n_obs=O, n_out=n_out, tile=tile, chunk=chunk,
        n_chunks=int(n_chunks), grid=G,
    )


def shard_stack_track_layout(layout: TrackLayout, n_dev: int, *,
                             tile: int = 2048,
                             with_kernel_plans: bool = True) -> TrackLayout:
    """Split a global TrackLayout into ``n_dev`` per-device layouts and
    stack them with a leading device axis (VERDICT r4 next #6 — the last
    sharded-kernel-parity exclusion).

    The tracked points are start-camera-sorted, so a contiguous chunk of
    layout columns is a contiguous band-row range per device; each device's
    fused track kernel emits full-width band partials that psum exactly
    like the pair-block psum (tpu_ba/solver/pairs.py solve_schur_sparse).
    ``slot_idx`` holds GLOBAL observation ids — the sharded pack gathers
    from the per-linearization all-gathered W, same as the pair gather.

    Per-device margin plans share (tile, chunk, n_out, n_obs) by
    construction (the auto-chunk formula depends only on those), so
    ``pad_stack_segsum_plans`` stacks them for shard_map delivery."""
    from tpu_ba.kernels.segsum import pad_stack_segsum_plans

    nt = layout.n_tracked
    nd = -(-max(nt, 1) // n_dev)                   # columns per device
    pt_pad_dev = _round_up(nd, tile)
    slot_idx = np.asarray(layout.slot_idx)
    slot_mask = np.asarray(layout.slot_mask)
    vperm = np.asarray(layout.vperm)
    keys = np.asarray(layout.keys)
    fill_key = int(keys[max(nt - 1, 0)])           # keeps keys sorted

    si, sm, vp, ky, plans = [], [], [], [], []
    for d in range(n_dev):
        lo, hi = d * nd, min((d + 1) * nd, nt)
        w = max(hi - lo, 0)
        pad = pt_pad_dev - w
        k_dev = keys[lo:hi]
        fill = int(k_dev[-1]) if w else fill_key
        si.append(np.pad(slot_idx[:, lo:hi], ((0, 0), (0, pad))))
        sm.append(np.pad(slot_mask[:, lo:hi], ((0, 0), (0, pad))))
        vp.append(np.pad(vperm[lo:hi], (0, pad)))
        ky.append(np.concatenate([k_dev, np.full(pad, fill, k_dev.dtype)]))
        if with_kernel_plans:
            plans.append(_build_margin_plan(ky[-1], layout.n_out, tile=tile,
                                            margin=layout.dmax - 1))
    plan = pad_stack_segsum_plans(plans) if plans else None
    return TrackLayout(
        slot_idx=jnp.asarray(np.stack(si).astype(np.int32)),
        slot_mask=jnp.asarray(np.stack(sm).astype(np.float32)),
        vperm=jnp.asarray(np.stack(vp).astype(np.int32)),
        keys=jnp.asarray(np.stack(ky).astype(np.int32)),
        plan=plan,
        dmax=layout.dmax, n_tracked=nt, pt_pad=pt_pad_dev,
        n_out=layout.n_out,
    )


def unstack_track_layout(layout: TrackLayout) -> TrackLayout:
    """Inside shard_map: drop the leading (length-1) device axis of a
    stacked TrackLayout."""
    from tpu_ba.kernels.segsum import unstack_plan

    return dataclasses.replace(
        layout,
        slot_idx=layout.slot_idx[0], slot_mask=layout.slot_mask[0],
        vperm=layout.vperm[0], keys=layout.keys[0],
        plan=unstack_plan(layout.plan) if layout.plan is not None else None)


def gather_track_data(W, V, layout: TrackLayout):
    """λ-free per-linearization pack: W into slot order (one O-sized
    permutation gather — the whole point of the layout), V into
    start-sorted point order. Returns (Wt (27, dmax, Pt_pad),
    Vt (9, Pt_pad))."""
    Wt = W[:, layout.slot_idx]                 # (27, dmax, Pt_pad)
    Vt = V[:, layout.vperm]                    # (9, Pt_pad)
    return Wt, Vt


def track_blocks_jnp(Wt, Vt, lam, layout: TrackLayout, dc: int,
                     diag_floor: float, diag_ceil: float):
    """jnp oracle/fallback for the fused track kernel: per-slot-pair
    products reduced by start camera. Returns (dmax·dc², n_out)."""
    from tpu_ba.solver.schur import inv3x3_rows

    d2 = dc * dc
    dmax = layout.dmax
    V = Vt
    dV = jnp.clip(jnp.stack([V[0], V[4], V[8]]), diag_floor, diag_ceil)
    Vl = V.at[0].add(lam * dV[0]).at[4].add(lam * dV[1]).at[8].add(lam * dV[2])
    Vinv = inv3x3_rows(Vl)                                  # (9, Pt)

    out = jnp.zeros((dmax * d2, layout.n_out), Wt.dtype)
    for a in range(dmax):
        Wa = Wt[:, a, :] * layout.slot_mask[a][None, :]
        M = jnp.stack([
            sum(Wa[3 * m + a2] * Vinv[3 * a2 + b2] for a2 in range(3))
            for m in range(dc) for b2 in range(3)
        ])                                                   # (3dc, Pt)
        for b in range(a, dmax):
            off = b - a
            Wb = Wt[:, b, :] * layout.slot_mask[b][None, :]
            vals = jnp.stack([
                sum(M[3 * m + b2] * Wb[3 * n + b2] for b2 in range(3))
                for m in range(dc) for n in range(dc)
            ])                                               # (d2, Pt)
            seg = jax.ops.segment_sum(
                vals.T, layout.keys + a, layout.n_out,
                indices_are_sorted=True).T                   # (d2, n_out)
            out = out.at[off * d2:(off + 1) * d2].add(seg)
    return out
