"""Pallas TPU kernel: block-sparse segment-sum over sorted keys.

This is the hot op of bundle adjustment (SURVEY.md §2.2 N7, BASELINE.json:5
"fused Pallas block-Jacobian … kernels; block-sparse JᵀJ assembly"): every
assembly pass (U, V, g) and both halves of the Schur matvec are
"per-observation blocks → accumulate by camera/point id". XLA lowers
``segment_sum`` to serialized scatter-adds — the measured bottleneck. This
kernel recasts the reduction as **dense one-hot matmuls on the MXU**:

  * observations arrive sorted by key (the problem layout guarantees it for
    cameras; a precomputed permutation gives the point-sorted order);
  * the output is processed in chunks of CHUNK segments; for each chunk the
    grid sweeps only the observation tiles whose keys can intersect it
    (scalar-prefetched per-chunk tile offsets — sortedness bounds them);
  * each (chunk, tile) program computes ``values_tile @ onehot`` where
    ``onehot[t, c] = (keys[t] == chunk·CHUNK + c)`` — keys outside the chunk
    contribute zeros, so chunk-boundary-straddling tiles are handled with no
    special cases — and accumulates into the chunk's VMEM-resident output
    block.

Layout is (D, O) / (D, N) — the reduction axis on *lanes* — so the output
block is (D_pad, CHUNK) and fits VMEM for any problem size (Venice included:
VMEM holds one chunk, not the whole output).

A jnp fallback (``jax.ops.segment_sum``) is kept forever as the correctness
oracle and the CPU/interpret CI path (SURVEY.md §7 M4).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class SegsumPlan:
    """Static schedule for one sorted-segment-sum shape (hashable)."""

    n_obs: int          # padded observation count (multiple of tile)
    n_out: int          # number of segments
    tile: int           # observations per tile
    chunk: int          # segments per output chunk
    n_chunks: int
    max_tiles_per_chunk: int


def build_segsum_plan(keys: np.ndarray, n_out: int, *, tile: int = 2048,
                      chunk: int | None = None) -> SegsumPlan:
    """Build the static schedule from concrete (host) sorted keys.

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
    n_chunks = math.ceil(n_out / chunk)
    n_tiles = O // tile

    # per-chunk range of observation tiles actually containing its keys
    first_obs = np.searchsorted(keys, np.arange(n_chunks) * chunk, side="left")
    last_obs = np.searchsorted(keys, np.minimum((np.arange(n_chunks) + 1) * chunk,
                                                n_out) - 1, side="right") - 1
    first_tile = first_obs // tile
    last_tile = np.maximum(last_obs, first_obs) // tile
    max_tiles = int(np.max(last_tile - first_tile + 1)) if n_chunks else 1
    return SegsumPlan(n_obs=O, n_out=n_out, tile=tile, chunk=chunk,
                      n_chunks=n_chunks, max_tiles_per_chunk=max_tiles)


def _chunk_tile_starts(keys, plan: SegsumPlan):
    """(n_chunks,) int32: first observation-tile index per output chunk —
    computed in-graph (keys may be traced)."""
    chunk_lo = jnp.arange(plan.n_chunks, dtype=keys.dtype) * plan.chunk
    first_obs = jnp.searchsorted(keys, chunk_lo, side="left")
    start = jnp.minimum(first_obs // plan.tile,
                        max(plan.n_obs // plan.tile - plan.max_tiles_per_chunk, 0))
    return start.astype(jnp.int32)


try:  # Pallas import is guarded: CPU CI works without TPU lowering
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _segsum_kernel(starts_ref, keys_ref, values_ref, out_ref):
    c = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    keys = keys_ref[0, :]                                   # (T,) int32
    chunk = out_ref.shape[1]
    local = keys - c * chunk                                # position in chunk
    cols = jax.lax.broadcasted_iota(jnp.int32, (keys.shape[0], chunk), 1)
    onehot = (local[:, None] == cols).astype(values_ref.dtype)   # (T, CHUNK)
    out_ref[:, :] += jnp.dot(values_ref[:, :], onehot,
                             preferred_element_type=values_ref.dtype)


def sorted_segment_sum(values, keys, n_out: int, plan: SegsumPlan | None = None,
                       *, use_pallas: bool = True, interpret: bool = False):
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
                         *, use_pallas: bool = True, interpret: bool = False):
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
    starts = _chunk_tile_starts(keys, plan)
    keys2d = keys.reshape(1, -1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(plan.n_chunks, plan.max_tiles_per_chunk),
        in_specs=[
            pl.BlockSpec((1, plan.tile),
                         lambda c, j, starts: (0, starts[c] + j)),
            pl.BlockSpec((D_pad, plan.tile),
                         lambda c, j, starts: (0, starts[c] + j)),
        ],
        out_specs=pl.BlockSpec((D_pad, plan.chunk),
                               lambda c, j, starts: (0, c)),
    )
    out_t = pl.pallas_call(
        _segsum_kernel,
        out_shape=jax.ShapeDtypeStruct((D_pad, plan.n_chunks * plan.chunk),
                                       values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, keys2d, values_t)
    return out_t[:D, :n_out]
