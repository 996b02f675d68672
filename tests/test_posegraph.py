"""Pose-graph LM tests: odometry chain + loop closures."""

import jax.numpy as jnp
import numpy as np

from tpu_ba.geometry.se3 import se3_compose, se3_inverse, se3_relative, se3_exp
from tpu_ba.posegraph import solve_pose_graph, pose_graph_cost


def _circle_graph(n=30, noise=0.05, seed=0):
    """Ground-truth poses on a circle; noisy odometry + loop-closure edges."""
    rng = np.random.default_rng(seed)
    gt = np.zeros((n, 6))
    for i in range(n):
        ang = 2 * np.pi * i / n
        gt[i, 0:3] = [0.0, ang, 0.0]          # yaw
        gt[i, 3:6] = [np.cos(ang), 0.0, np.sin(ang)]
    gt_j = jnp.asarray(gt)

    ei, ej, meas = [], [], []

    def add_edge(i, j, noisy=True):
        z = se3_relative(gt_j[i], gt_j[j])
        if noisy:
            xi = noise * rng.standard_normal(6)
            z = se3_compose(se3_exp(jnp.asarray(xi)), z)
        ei.append(i)
        ej.append(j)
        meas.append(np.asarray(z))

    for i in range(1, n):
        add_edge(i, i - 1)
    add_edge(0, n - 1)                # loop closure
    add_edge(n // 2, 0)
    return gt, np.asarray(ei, np.int32), np.asarray(ej, np.int32), np.stack(meas)


def test_zero_noise_graph_is_fixed_point():
    gt, ei, ej, _ = _circle_graph(noise=0.0)
    # rebuild exact measurements
    gt_j = jnp.asarray(gt)
    meas = np.stack([np.asarray(se3_relative(gt_j[i], gt_j[j]))
                     for i, j in zip(ei, ej)])
    c = float(pose_graph_cost(gt_j, jnp.asarray(ei), jnp.asarray(ej),
                              jnp.asarray(meas)))
    assert c < 1e-16


def test_posegraph_converges():
    gt, ei, ej, meas = _circle_graph(n=30, noise=0.03, seed=1)
    rng = np.random.default_rng(2)
    init = gt + 0.1 * rng.standard_normal(gt.shape)
    init[0] = gt[0]  # anchor
    nodes, cost, iters = solve_pose_graph(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(meas))
    c0 = float(pose_graph_cost(jnp.asarray(init), jnp.asarray(ei),
                               jnp.asarray(ej), jnp.asarray(meas)))
    assert float(cost) < 0.1 * c0
    # translations near ground truth (gauge anchored at node 0)
    err = np.linalg.norm(np.asarray(nodes)[:, 3:6] - gt[:, 3:6], axis=1)
    assert np.median(err) < 0.15, np.median(err)


def test_posegraph_weighted():
    gt, ei, ej, meas = _circle_graph(n=20, noise=0.05, seed=3)
    rng = np.random.default_rng(4)
    init = gt + 0.05 * rng.standard_normal(gt.shape)
    sqrt_info = np.tile(np.eye(6, dtype=np.float64)[None], (len(ei), 1, 1)) * 2.0
    nodes, cost, _ = solve_pose_graph(
        jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
        jnp.asarray(meas), jnp.asarray(sqrt_info))
    c0 = pose_graph_cost(jnp.asarray(init), jnp.asarray(ei), jnp.asarray(ej),
                         jnp.asarray(meas), jnp.asarray(sqrt_info))
    assert float(cost) < float(c0)


def test_sfm_pose_graph_bridge():
    """Drifted SfM trajectory + a ground-truth loop-closure edge → pose
    graph pulls the trajectory back toward truth."""
    import dataclasses as dc

    import numpy as np

    from tpu_ba.sfm.incremental import SfMResult
    from tpu_ba.sfm.posegraph_bridge import refine_sfm_with_pose_graph

    rng = np.random.default_rng(5)
    n = 12
    gt = np.zeros((n, 6))
    for i in range(n):
        ang = 2 * np.pi * i / n
        gt[i] = [0, ang, 0, np.cos(ang), 0, np.sin(ang)]

    # accumulate drift: each pose progressively off
    drift = np.cumsum(0.02 * rng.standard_normal((n, 6)), axis=0)
    drift[0] = 0
    poses = gt + drift

    res = SfMResult(poses=poses, points=np.zeros((1, 3)),
                    track_frame=np.zeros(1, int), track_point=np.zeros(1, int),
                    track_xy=np.zeros((1, 2)), registered=np.ones(n, bool),
                    final_cost=0.0, report={})
    # loop closure: true relative pose between last and first frames
    z = se3_relative(jnp.asarray(gt[n - 1]), jnp.asarray(gt[0]))
    refined, cost, iters = refine_sfm_with_pose_graph(
        res, extra_edges=[(n - 1, 0, np.asarray(z))])
    err_before = np.linalg.norm(poses[-1, 3:6] - gt[-1, 3:6])
    err_after = np.linalg.norm(refined.poses[-1, 3:6] - gt[-1, 3:6])
    assert err_after < err_before, (err_before, err_after)
