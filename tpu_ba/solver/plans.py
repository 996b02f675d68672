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
import numpy as np

from tpu_ba.kernels.segsum import SegsumPlan, build_segsum_plan


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["perm_pt", "pt_sorted_keys", "cam_plan", "pt_plan"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class AssemblyPlans:
    perm_pt: jax.Array          # (O,) int32: obs order → point-sorted order
    pt_sorted_keys: jax.Array   # (O,) int32: pt_idx[perm_pt] (sorted)
    cam_plan: SegsumPlan
    pt_plan: SegsumPlan


def build_plans(cam_idx, pt_idx, n_cameras: int, n_points: int,
                *, tile: int = 2048) -> AssemblyPlans:
    """Host-side plan construction from concrete index arrays."""
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
    return AssemblyPlans(
        perm_pt=jnp.asarray(perm),
        pt_sorted_keys=jnp.asarray(pk),
        cam_plan=cam_plan,
        pt_plan=pt_plan,
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
    """Point-keyed segment sum, lane-major: (D, O) → (D, P). With a plan the
    permutation into point-sorted order is a lane-axis gather."""
    from tpu_ba.kernels.segsum import sorted_segment_sum_t

    if plans is None:
        # cam-sorted order ⇒ point keys are NOT sorted here
        return jax.ops.segment_sum(values_t.T, pt_idx, n_points).T
    return sorted_segment_sum_t(values_t[:, plans.perm_pt],
                                plans.pt_sorted_keys, n_points,
                                plan=plans.pt_plan)
