"""Linear (DLT) triangulation, batched over correspondences.

Capability parity: the reference pipeline's triangulation stage (SURVEY.md
§2.1 R6). One vmapped 4×4 SVD per point — shape-static, fused by XLA.
Normalized camera coordinates, +z convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_points(P1, P2, x1, x2):
    """DLT triangulation. P1, P2: (3, 4) projection matrices (normalized
    coords); x1, x2: (K, 2). Returns X (K, 3) world points."""

    def _one(u1, u2):
        A = jnp.stack([
            u1[0] * P1[2] - P1[0],
            u1[1] * P1[2] - P1[1],
            u2[0] * P2[2] - P2[0],
            u2[1] * P2[2] - P2[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        Xh = vt[-1]
        return Xh[0:3] / jnp.where(jnp.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])

    return jax.vmap(_one)(x1, x2)


def triangulate_pairwise(poses_i, poses_j, x_i, x_j):
    """Triangulate K points, each from its own camera pair.

    poses_i/j: (K, 3, 4) per-point projection matrices; x_i/j: (K, 2).
    """

    def _one(Pi, Pj, ui, uj):
        A = jnp.stack([
            ui[0] * Pi[2] - Pi[0],
            ui[1] * Pi[2] - Pi[1],
            uj[0] * Pj[2] - Pj[0],
            uj[1] * Pj[2] - Pj[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        Xh = vt[-1]
        return Xh[0:3] / jnp.where(jnp.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])

    return jax.vmap(_one)(poses_i, poses_j, x_i, x_j)
