"""Bridge: SfM trajectory → pose graph → refined trajectory.

Capability parity: the reference pipeline feeds its SfM trajectory into
"downstream pose-graph refinement" (BASELINE.json:5; SURVEY.md §3.1c). This
module converts an :class:`~tpu_ba.sfm.incremental.SfMResult` trajectory
into pose-graph form (odometry edges between consecutive registered frames,
plus caller-supplied loop-closure edges), runs the SE(3) LM of
tpu_ba/posegraph, and writes the refined poses back.

Scale note: SfM poses are in the gauge fixed by the two-view init; odometry
measurements are taken from the (windowed-BA-refined) estimates themselves,
so pose-graph refinement is a no-op without extra constraints — its value is
distributing the correction of *loop-closure* edges (from a relocalized
match or external sensor) over the whole trajectory.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpu_ba.geometry.se3 import se3_relative
from tpu_ba.posegraph import solve_pose_graph


def sfm_to_pose_graph(res, extra_edges=None):
    """Build pose-graph arrays from an SfMResult.

    extra_edges: optional list of (i, j, z_ij (6,)) loop-closure constraints
    (frame indices into the original sequence).
    Returns (nodes (N,6), ei, ej, meas, frame_ids) with N = registered count.
    """
    reg = np.where(res.registered)[0]
    fmap = {f: i for i, f in enumerate(reg)}
    nodes = res.poses[reg].copy()
    nodes_j = jnp.asarray(nodes)

    ei, ej, meas = [], [], []
    for a, b in zip(reg[1:], reg[:-1]):
        ei.append(fmap[a])
        ej.append(fmap[b])
        meas.append(np.asarray(se3_relative(nodes_j[fmap[a]], nodes_j[fmap[b]])))
    if extra_edges:
        for i, j, z in extra_edges:
            if i in fmap and j in fmap:
                ei.append(fmap[i])
                ej.append(fmap[j])
                meas.append(np.asarray(z))
    return (nodes, np.asarray(ei, np.int32), np.asarray(ej, np.int32),
            np.stack(meas), reg)


def refine_sfm_with_pose_graph(res, extra_edges=None, max_iters: int = 30):
    """Run pose-graph LM over an SfM trajectory; returns a new SfMResult
    with refined poses (points are NOT retriangulated — run a global BA
    afterwards for that)."""
    nodes, ei, ej, meas, reg = sfm_to_pose_graph(res, extra_edges)
    new_nodes, cost, iters = solve_pose_graph(
        jnp.asarray(nodes), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(meas), max_iters=max_iters)
    poses = res.poses.copy()
    poses[reg] = np.asarray(new_nodes)
    return dataclasses.replace(res, poses=poses), float(cost), int(iters)
