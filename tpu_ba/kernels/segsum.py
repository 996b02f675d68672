"""Pallas TPU kernel: block-sparse segment-sum over sorted keys.

This is the hot op of bundle adjustment (SURVEY.md §2.2 N7, BASELINE.json:5
"fused Pallas block-Jacobian … kernels; block-sparse JᵀJ assembly"): every
assembly pass (U, V, g) and both halves of the Schur matvec are
"per-observation blocks → accumulate by camera/point id". XLA lowers
``segment_sum`` to serialized scatter-adds — the measured bottleneck. This
kernel recasts the reduction as **dense one-hot matmuls on the MXU**:

  * observations arrive sorted by key (the problem layout guarantees it for
    cameras; a precomputed permutation gives the point-sorted order);
  * the output is processed in chunks of CHUNK segments; each (chunk, tile)
    work item computes ``values_tile @ onehot`` where
    ``onehot[t, c] = (keys[t] == chunk·CHUNK + c)`` — keys outside the chunk
    contribute zeros, so chunk-boundary-straddling tiles are handled with no
    special cases — and accumulates into the chunk's VMEM-resident output
    block;
  * the grid is a **flattened work list** of only the (chunk, tile) pairs
    whose key ranges actually intersect (scalar-prefetched ``prog_chunk`` /
    ``prog_tile`` arrays). Round 1 used a rectangular
    (n_chunks × max_tiles_per_chunk) grid, which re-reads every observation
    tile up to max_tiles times — a measured ~5× HBM read amplification on
    the ladybug-49 pair plan. The work list reads each tile once per chunk
    it overlaps (average overlap ~1.0x).

Layout is (D, O) / (D, N) — the reduction axis on *lanes* — so the output
block is (D_pad, CHUNK) and fits VMEM for any problem size (Venice included:
VMEM holds one chunk, not the whole output).

The one-hot matmul runs at ``Precision.HIGHEST``: TPU f32 matmuls default to
a single bf16 pass (8-bit mantissa), measured in round 1 as a 22% final-cost
error on ladybug-1723 (scripts/solver_compare.json). The one-hot operand is
bf16-exact; HIGHEST recovers full f32 products for the values operand.

A jnp fallback (``jax.ops.segment_sum``) is kept forever as the correctness
oracle and the CPU/interpret CI path (SURVEY.md §7 M4).
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
    data_fields=["prog_chunk", "prog_tile", "prog_first"],
    meta_fields=["n_obs", "n_out", "tile", "chunk", "n_chunks", "grid"],
)
@dataclasses.dataclass(frozen=True)
class SegsumPlan:
    """Static work-list schedule for one sorted-segment-sum shape.

    ``prog_chunk[k]`` / ``prog_tile[k]`` name the output chunk and input
    observation tile of grid step k (chunks ascending, tiles ascending within
    a chunk — so each output block is resident in VMEM for one contiguous run
    of programs); ``prog_first[k]`` is 1 on the first program of each chunk
    (zero-initialises the output block). Every chunk gets at least one
    program — chunks with no intersecting keys get a dummy tile whose keys
    all fall outside the chunk and contribute exact zeros.
    """

    prog_chunk: jax.Array   # (G,) int32
    prog_tile: jax.Array    # (G,) int32
    prog_first: jax.Array   # (G,) int32 (0/1)
    n_obs: int              # padded observation count (multiple of tile)
    n_out: int              # number of segments
    tile: int               # observations per tile
    chunk: int              # segments per output chunk
    n_chunks: int
    grid: int               # G — total work items


def build_segsum_plan(keys: np.ndarray, n_out: int, *, tile: int = 2048,
                      chunk: int | None = None) -> SegsumPlan:
    """Build the static work list from concrete (host) sorted keys.

    ``keys`` must be sorted ascending (padding rows should carry the last
    key, keeping sortedness). The plan depends only on the key *distribution*
    and is reused across iterations.
    """
    keys = np.asarray(keys)
    O = keys.shape[0]
    if O % tile != 0:
        raise ValueError(f"n_obs {O} must be a multiple of tile {tile}")
    if np.any(np.diff(keys) < 0):
        raise ValueError("keys must be sorted ascending")
    if chunk is None:
        # denser segments → fewer obs tiles per chunk; aim for ~2-4 tiles
        avg_per_seg = O / max(n_out, 1)
        chunk = int(min(2048, max(128, _round_up(int(2.0 * tile / max(avg_per_seg, 1e-9)), 128))))
    n_chunks = -(-n_out // chunk)
    n_tiles = O // tile

    # per-chunk range of observation tiles actually containing its keys
    lo = np.arange(n_chunks) * chunk
    hi = np.minimum(lo + chunk, n_out)
    first_obs = np.searchsorted(keys, lo, side="left")
    last_obs = np.searchsorted(keys, hi - 1, side="right") - 1
    empty = last_obs < first_obs
    first_tile = np.minimum(first_obs // tile, n_tiles - 1)
    last_tile = np.where(empty, first_tile,
                         np.maximum(last_obs, first_obs) // tile)
    # empty chunks still get one (dummy) program so their output block is
    # zero-initialised; the dummy tile's keys fall outside the chunk.
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


try:  # Pallas import is guarded: CPU CI works without TPU lowering
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def resolve_interpret(interpret: bool | None) -> bool:
    """Pallas TPU kernels only run compiled on TPU; on CPU backends fall back
    to interpret mode automatically (so the *_pallas solver variants work
    everywhere — CI runs them on the 8-device CPU mesh)."""
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


# experiment knob (round 4): TPU_BA_SPLIT_PASSES=2 drops the one-hot
# reductions to a 2-term bf16 split (~16 mantissa bits) — fewer MXU passes
# in the build kernels at the cost of reduction precision. Default 3
# (~24 bits, ≡ HIGHEST); set at import time so the choice is baked into
# the compiled program.
import os as _os

_SPLIT_PASSES = int(_os.environ.get("TPU_BA_SPLIT_PASSES", "3"))


def split3_onehot_dot(vals, onehot_bool):
    """f32-accurate ``vals @ onehot`` in 3 native bf16 MXU passes.

    TPU f32 matmuls default to ONE bf16 pass (8-bit mantissa — measured 22%
    final-cost error on ladybug-1723 in round 1) and Precision.HIGHEST costs
    6 passes (3-term splits of BOTH operands). A one-hot operand is exactly
    representable in bf16, so only ``vals`` needs the 3-term split
    v = v₁+v₂+v₃ (~24 mantissa bits): three bf16×bf16→f32 products match
    HIGHEST accuracy at half the MXU passes — the build kernel is
    MXU-pass-bound (VERDICT.md round 2, next #1 profiling).

    Non-f32 dtypes (the f64 CPU/interpret oracle path) keep the plain
    HIGHEST dot — a bf16 split would destroy f64 precision."""
    if vals.dtype != jnp.float32:
        return jnp.dot(vals, onehot_bool.astype(vals.dtype),
                       preferred_element_type=vals.dtype,
                       precision=jax.lax.Precision.HIGHEST)
    # precision=DEFAULT is required: the package default is HIGHEST, which
    # on bf16 operands stamps an fp32 contract precision Mosaic rejects
    # ("Bad lhs type"); DEFAULT on bf16 inputs is the native single-pass
    # bf16×bf16→f32 MXU mode, which is exactly what the split wants.
    dot = partial(jnp.dot, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    oh = onehot_bool.astype(jnp.bfloat16)
    v1 = vals.astype(jnp.bfloat16)
    r1 = vals - v1.astype(jnp.float32)
    v2 = r1.astype(jnp.bfloat16)
    if _SPLIT_PASSES == 2:
        # experimental 2-pass split (~16 mantissa bits): measured round 4 —
        # see the env knob note above
        return dot(v1, oh) + dot(v2, oh)
    v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(v1, oh) + dot(v2, oh) + dot(v3, oh)


def _segsum_kernel(chunk_ref, tile_ref, first_ref, keys_ref, values_ref,
                   out_ref):
    k = pl.program_id(0)

    @pl.when(first_ref[k] == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    keys = keys_ref[0, :]                                   # (T,) int32
    chunk = out_ref.shape[1]
    local = keys - chunk_ref[k] * chunk                     # position in chunk
    cols = jax.lax.broadcasted_iota(jnp.int32, (keys.shape[0], chunk), 1)
    onehot = local[:, None] == cols                         # (T, CHUNK)
    out_ref[:, :] += split3_onehot_dot(values_ref[:, :], onehot)


def sorted_segment_sum(values, keys, n_out: int, plan: SegsumPlan | None = None,
                       *, use_pallas: bool = True, interpret: bool | None = None):
    """Segment-sum of ``values`` (O, D) by sorted ``keys`` (O,) → (n_out, D).

    With ``use_pallas`` (and a TPU backend or ``interpret=True``) runs the
    chunked one-hot MXU kernel; otherwise the jnp scatter fallback. The two
    paths agree exactly up to f32 summation order (tested).
    """
    if plan is None or not use_pallas or not _HAVE_PALLAS:
        return jax.ops.segment_sum(values, keys, n_out, indices_are_sorted=True)
    return sorted_segment_sum_t(values.T, keys, n_out, plan=plan,
                                interpret=interpret).T


def sorted_segment_sum_t(values_t, keys, n_out: int,
                         plan: SegsumPlan | None = None,
                         *, use_pallas: bool = True, interpret: bool | None = None):
    """Lane-major segment sum: ``values_t`` (D, O) → (D, n_out).

    Same kernel as sorted_segment_sum but without the entry/exit transposes —
    the layout the explicit-Schur pair reduction (tpu_ba/solver/pairs.py)
    keeps everything in.
    """
    if plan is None or not use_pallas or not _HAVE_PALLAS:
        return jax.ops.segment_sum(values_t.T, keys, n_out,
                                   indices_are_sorted=True).T

    D, O = values_t.shape
    D_pad = _round_up(max(D, 1), 8)
    values = values_t
    if D_pad != D:
        values_t = jnp.zeros((D_pad, O), values.dtype).at[:D, :].set(values)
    keys2d = keys.reshape(1, -1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(plan.grid,),
        in_specs=[
            pl.BlockSpec((1, plan.tile),
                         lambda k, pc, pt, pf: (0, pt[k])),
            pl.BlockSpec((D_pad, plan.tile),
                         lambda k, pc, pt, pf: (0, pt[k])),
        ],
        out_specs=pl.BlockSpec((D_pad, plan.chunk),
                               lambda k, pc, pt, pf: (0, pc[k])),
    )
    out_t = pl.pallas_call(
        _segsum_kernel,
        out_shape=jax.ShapeDtypeStruct((D_pad, plan.n_chunks * plan.chunk),
                                       values.dtype),
        grid_spec=grid_spec,
        interpret=resolve_interpret(interpret),
    )(plan.prog_chunk, plan.prog_tile, plan.prog_first, keys2d, values_t)
    return out_t[:D, :n_out]


def pad_stack_segsum_plans(plans: "list[SegsumPlan]") -> SegsumPlan:
    """Stack per-device SegsumPlans into ONE plan with a leading device
    axis on the program arrays, padded to the longest grid.

    All plans must share (tile, chunk, n_out, n_obs) — built over equal
    observation shards of one problem. Padding programs target a TRASH
    output chunk appended past ``n_chunks`` (the consumers slice their
    outputs to n_out, so the trash block is never read); their tile-0 keys
    fall outside the trash chunk's range, so even their one-hot
    contributions are exact zeros. This is what lets the fused Pallas
    assembly kernels run UNDER shard_map: each device reads its own (G,)
    program rows from the stacked (n_dev, G) arrays (VERDICT r3 missing
    #5 — sharded kernel parity)."""
    import numpy as np

    p0 = plans[0]
    for p in plans[1:]:
        assert (p.tile, p.chunk, p.n_out, p.n_obs) == \
            (p0.tile, p0.chunk, p0.n_out, p0.n_obs), "incompatible plans"
    G = max(p.grid for p in plans)
    trash = p0.n_chunks                       # one extra chunk id
    pc, pt, pf = [], [], []
    for p in plans:
        pad = G - p.grid
        pc.append(np.concatenate([np.asarray(p.prog_chunk),
                                  np.full(pad, trash, np.int32)]))
        pt.append(np.concatenate([np.asarray(p.prog_tile),
                                  np.zeros(pad, np.int32)]))
        first = np.concatenate([np.asarray(p.prog_first),
                                np.zeros(pad, np.int32)])
        if pad:
            first[p.grid] = 1                 # zero-init the trash block
        pf.append(first)
    return SegsumPlan(
        prog_chunk=jnp.asarray(np.stack(pc).astype(np.int32)),
        prog_tile=jnp.asarray(np.stack(pt).astype(np.int32)),
        prog_first=jnp.asarray(np.stack(pf).astype(np.int32)),
        n_obs=p0.n_obs, n_out=p0.n_out, tile=p0.tile, chunk=p0.chunk,
        n_chunks=p0.n_chunks + 1, grid=G,
    )


def unstack_plan(plan: SegsumPlan) -> SegsumPlan:
    """Inside shard_map: drop the leading (length-1) device axis a stacked
    plan arrives with."""
    import dataclasses as _dc

    return _dc.replace(plan, prog_chunk=plan.prog_chunk[0],
                       prog_tile=plan.prog_tile[0],
                       prog_first=plan.prog_first[0])
