"""Distributed bundle adjustment over a device mesh.

Capability parity: the multi-host "keyframe-partitioned" distributed BA
mandated by BASELINE.json:5,11 (the reference is single-process MATLAB —
SURVEY.md §2.1 — so this layer is new capability, not a port).

Design (SURVEY.md §2.2 N8, §3.2):
  * 1-D mesh over all devices (ICI within a host, DCN across hosts when
    launched under ``jax.distributed.initialize``).
  * **Observations are sharded** along the mesh axis. Because observations
    are sorted by camera (tpu_ba.core.make_problem), equal-size observation
    shards are contiguous camera ranges — i.e. a keyframe partition: each
    device owns the observations of a contiguous run of cameras.
  * **Camera and point states are replicated.** Camera state is tiny
    (C×9); point state (P×3) and the V blocks (P×3×3) are tens of MB even
    for Venice-1778 — well within HBM, and replication makes the Schur
    reduction a pure psum pattern with no gather traffic.
  * All communication is ``psum`` of segment-sum partials: 4 per
    linearization (U, V, g_c, g_p + cost), 2 per CG iteration (the point-
    and camera-side reductions of the S matvec), 1 each for RHS/diag/back-
    substitution. Everything rides XLA collectives; there is no NCCL/MPI.

The solver body is literally ``tpu_ba.solver.lm.lm_loop`` with
``axis_name="obs"`` — single-device and distributed results are identical
up to floating-point reduction order (tested in tests/test_sharding.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ba.core import BAProblem, LMConfig, LMResult
from tpu_ba.solver.lm import lm_loop

AXIS = "obs"


def make_mesh(devices=None, axis_name: str = AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_problem(problem: BAProblem, mesh: Mesh) -> BAProblem:
    """Re-pad the observation axis to a multiple of the mesh size and place
    the arrays: observation-indexed arrays sharded over the mesh axis,
    camera/point state replicated."""
    n_dev = mesh.devices.size
    O = problem.obs_2d.shape[0]
    O_pad = ((O + n_dev - 1) // n_dev) * n_dev
    pad = O_pad - O
    if pad:
        problem = dataclasses.replace(
            problem,
            obs_2d=jnp.pad(problem.obs_2d, ((0, pad), (0, 0))),
            cam_idx=jnp.pad(problem.cam_idx, (0, pad)),
            pt_idx=jnp.pad(problem.pt_idx, (0, pad)),
            mask=jnp.pad(problem.mask, (0, pad)),
        )
    obs_sh = NamedSharding(mesh, P(AXIS))
    rep_sh = NamedSharding(mesh, P())
    return dataclasses.replace(
        problem,
        cameras=jax.device_put(problem.cameras, rep_sh),
        points=jax.device_put(problem.points, rep_sh),
        obs_2d=jax.device_put(problem.obs_2d, obs_sh),
        cam_idx=jax.device_put(problem.cam_idx, obs_sh),
        pt_idx=jax.device_put(problem.pt_idx, obs_sh),
        mask=jax.device_put(problem.mask, obs_sh),
    )


@partial(jax.jit, static_argnums=(1, 2))
def _solve_sharded_jit(problem: BAProblem, config: LMConfig, mesh: Mesh) -> LMResult:
    fn = jax.shard_map(
        partial(
            lm_loop,
            n_cameras=problem.cameras.shape[0],
            n_points=problem.points.shape[0],
            config=config,
            axis_name=AXIS,
        ),
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(problem.cameras, problem.points, problem.obs_2d,
              problem.cam_idx, problem.pt_idx, problem.mask)


def solve_sharded(problem: BAProblem, config: LMConfig | None = None,
                  mesh: Mesh | None = None) -> LMResult:
    """Distributed LM bundle adjustment. ``problem`` should have been placed
    with :func:`shard_problem` (done automatically otherwise)."""
    if config is None:
        config = LMConfig()
    if config.linear_solver == "dense":
        raise ValueError("dense solver has no sharded path; use schur_pcg")
    if mesh is None:
        mesh = make_mesh()
    O = problem.obs_2d.shape[0]
    if O % mesh.devices.size != 0:
        problem = shard_problem(problem, mesh)
    return _solve_sharded_jit(problem, config, mesh)
