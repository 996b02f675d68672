"""Block-sparse Gauss-Newton system assembly.

Capability parity: "sparse JᵀJ assembly" of the reference's normal-equation
step (BASELINE.json:5, SURVEY.md §2.1 R4) — re-designed for the TPU memory
model. Instead of a global sparse matrix, the system is kept in *block* form:

    H = [ U   W ]     U: (C, dc, dc) camera diagonal blocks
        [ Wᵀ  V ]     V: (P, 3, 3)  point diagonal blocks
                      W: (O, dc, 3) one coupling block per observation
                         (each (camera, point) pair is observed at most once,
                          so W's sparsity pattern IS the observation list)

U, V and the gradient are segment-sums over the observation axis — batched
outer products on the VPU/MXU followed by a segmented reduction. Observations
arrive sorted by camera (tpu_ba.core.make_problem), so the camera-indexed
segment sums reduce over contiguous runs (``indices_are_sorted=True``), which
is also the layout the Pallas assembly kernel exploits (tpu_ba/kernels/).

Robust IRLS weighting (√ρ′ scaling of r and J) happens here, once per
linearization, following the standard first-order robustified Gauss-Newton.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_ba.residuals.robust import robust_weight


class BlockSystem(NamedTuple):
    """The assembled (robust-weighted) Gauss-Newton system in block form."""

    U: jax.Array        # (C, dc, dc) camera diagonal blocks of JᵀJ
    V: jax.Array        # (P, 3, 3)   point diagonal blocks of JᵀJ
    W: jax.Array        # (O, dc, 3)  per-observation coupling blocks
    gc: jax.Array       # (C, dc)     camera gradient Jᵀr
    gp: jax.Array       # (P, 3)      point gradient Jᵀr
    cost: jax.Array     # scalar, ½ Σ ρ(|r|²)
    cam_idx: jax.Array  # (O,)
    pt_idx: jax.Array   # (O,)


def apply_irls_weights(r, Jc, Jp, robust_kind: int, robust_scale: float, mask=None):
    """Scale residuals and Jacobian blocks by √ρ′(|r|²).

    Returns (r_w, Jc_w, Jp_w, cost) where cost is the *robust* cost of the
    unweighted residuals.
    """
    s = jnp.sum(r * r, axis=-1)
    from tpu_ba.residuals.robust import robust_rho

    rho = robust_rho(robust_kind, s, robust_scale)
    if mask is not None:
        rho = jnp.where(mask, rho, 0.0)
    cost = 0.5 * jnp.sum(rho)

    w = robust_weight(robust_kind, s, robust_scale)
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    sw = jnp.sqrt(w)
    return r * sw[:, None], Jc * sw[:, None, None], Jp * sw[:, None, None], cost


def assemble(r, Jc, Jp, cam_idx, pt_idx, n_cameras: int, n_points: int,
             robust_kind: int = 0, robust_scale: float = 1.0, mask=None,
             axis_name: str | None = None, plans=None) -> BlockSystem:
    """Assemble the block system from per-observation residuals/Jacobians.

    All inputs already have masked rows zeroed (see jacobian_blocks_*); the
    IRLS weighting re-applies the mask to guard the ρ′ of padded rows.

    Under ``shard_map`` (observations sharded over ``axis_name``,
    cameras/points replicated — SURVEY.md §2.2 N8) the segment sums become
    local partial sums followed by one ``psum`` each; U/V/g/cost come back
    replicated, while W and the index maps stay shard-local (the Schur matvec
    consumes them shard-locally with its own psums).
    """
    r, Jc, Jp, cost = apply_irls_weights(r, Jc, Jp, robust_kind, robust_scale, mask)

    # per-observation outer products (batched; MXU/VPU friendly)
    O = r.shape[0]
    dc = Jc.shape[-1]
    UtU = jnp.einsum("oki,okj->oij", Jc, Jc)   # (O, dc, dc)
    VtV = jnp.einsum("oki,okj->oij", Jp, Jp)   # (O, 3, 3)
    W = jnp.einsum("oki,okj->oij", Jc, Jp)     # (O, dc, 3)
    gco = jnp.einsum("oki,ok->oi", Jc, r)      # (O, dc)
    gpo = jnp.einsum("oki,ok->oi", Jp, r)      # (O, 3)

    if plans is not None and axis_name is None:
        from tpu_ba.solver.plans import cam_segsum, pt_segsum

        # one packed kernel call per side (camera: dc²+dc lanes, point: 12)
        cam_packed = cam_segsum(
            plans, jnp.concatenate([UtU.reshape(O, dc * dc), gco], axis=1),
            cam_idx, n_cameras)
        U = cam_packed[:, : dc * dc].reshape(n_cameras, dc, dc)
        gc = cam_packed[:, dc * dc:]
        pt_packed = pt_segsum(
            plans, jnp.concatenate([VtV.reshape(O, 9), gpo], axis=1),
            pt_idx, n_points)
        V = pt_packed[:, :9].reshape(n_points, 3, 3)
        gp = pt_packed[:, 9:]
    else:
        U = jax.ops.segment_sum(UtU, cam_idx, n_cameras, indices_are_sorted=True)
        gc = jax.ops.segment_sum(gco, cam_idx, n_cameras, indices_are_sorted=True)
        V = jax.ops.segment_sum(VtV, pt_idx, n_points)
        gp = jax.ops.segment_sum(gpo, pt_idx, n_points)

    if axis_name is not None:
        U = jax.lax.psum(U, axis_name)
        V = jax.lax.psum(V, axis_name)
        gc = jax.lax.psum(gc, axis_name)
        gp = jax.lax.psum(gp, axis_name)
        cost = jax.lax.psum(cost, axis_name)

    return BlockSystem(U=U, V=V, W=W, gc=gc, gp=gp, cost=cost,
                       cam_idx=cam_idx, pt_idx=pt_idx)


def damp_blocks(B, lam, diag_floor: float, diag_ceil: float):
    """Marquardt damping: add λ·clamp(diag) to the diagonal of each block.

    Returns (U_λ, V_λ). Matches the reference's per-iteration damping of the
    normal equations (BASELINE.json:5), in Ceres' diagonal-scaled form.
    """
    def _damp(M):
        d = jnp.clip(jnp.diagonal(M, axis1=-2, axis2=-1), diag_floor, diag_ceil)
        n = M.shape[-1]
        return M + lam * d[..., None] * jnp.eye(n, dtype=M.dtype)

    return _damp(B.U), _damp(B.V)
