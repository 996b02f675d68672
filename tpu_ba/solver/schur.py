"""Matrix-free Schur complement: eliminate points, solve cameras.

Capability parity: "Schur-complement elimination of points" (BASELINE.json:5,
SURVEY.md §2.1 R4). TPU design (SURVEY.md §3.2a): the reduced camera system

    S = U_λ − W V_λ⁻¹ Wᵀ,      b = −g_c + W V_λ⁻¹ g_p

is never materialized. Its matvec is two gather→batched-matmul→segment-sum
sweeps over the observation axis — exactly the shape of the assembly pass, so
the same Pallas kernel family accelerates both (tpu_ba/kernels/). The 3×3
point blocks are inverted in closed form (adjugate), batched over P on the
VPU. Under ``shard_map`` the two segment-sums become local partial sums
followed by one ``psum`` each (tpu_ba/sharding/).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ba.solver.normal import BlockSystem, damp_blocks


def inv3x3(M):
    """Batched closed-form 3×3 inverse via the adjugate.

    (P,3,3) → (P,3,3). ~30 FLOPs per block, no linalg dispatch, fuses with
    neighbors. Assumes blocks are SPD after damping (det > 0); a floor on the
    determinant guards padded/empty point blocks.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    Cc = d * h - e * g
    det = a * A + b * B + c * Cc
    det_safe = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([Cc, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det_safe[..., None, None]


def _reduce(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _cam_sum(values, cam_idx, n, axis_name, plans):
    if plans is not None and axis_name is None:
        from tpu_ba.solver.plans import cam_segsum

        return cam_segsum(plans, values, cam_idx, n)
    out = jax.ops.segment_sum(values, cam_idx, n, indices_are_sorted=True)
    return _reduce(out, axis_name)


def _pt_sum(values, pt_idx, n, axis_name, plans):
    if plans is not None and axis_name is None:
        from tpu_ba.solver.plans import pt_segsum

        return pt_segsum(plans, values, pt_idx, n)
    out = jax.ops.segment_sum(values, pt_idx, n)
    return _reduce(out, axis_name)


def w_vinv_wt_diag(W, Vinv, cam_idx, pt_idx, n_cameras: int, axis_name=None,
                   plans=None):
    """Σ_obs W_o V⁻¹[pt_o] W_oᵀ accumulated per camera → (C, dc, dc).

    This is the second term of diag(S); used for the block-Jacobi
    preconditioner (exact block diagonal of S).
    """
    O, dc, _ = W.shape
    Vi = Vinv[pt_idx]                                  # (O,3,3) gather
    WVi = jnp.einsum("oij,ojk->oik", W, Vi)            # (O,dc,3)
    WViWt = jnp.einsum("oik,ojk->oij", WVi, W)         # (O,dc,dc)
    out = _cam_sum(WViWt.reshape(O, dc * dc), cam_idx, n_cameras, axis_name, plans)
    return out.reshape(n_cameras, dc, dc)


def schur_rhs(B: BlockSystem, Vinv, axis_name=None, plans=None):
    """b = −g_c + W V_λ⁻¹ g_p → (C, dc)."""
    t = jnp.einsum("pij,pj->pi", Vinv, B.gp)           # (P,3) replicated
    Wt = jnp.einsum("oij,oj->oi", B.W, t[B.pt_idx])    # (O,dc) shard-local
    n_cameras = B.U.shape[0]
    return -B.gc + _cam_sum(Wt, B.cam_idx, n_cameras, axis_name, plans)


def make_schur_matvec(Ul, W, Vinv, cam_idx, pt_idx, n_points: int, axis_name=None,
                      plans=None):
    """Returns x ↦ S·x for x of shape (C, dc), matrix-free.

    Under sharding: x, Ul, Vinv are replicated; W and the index maps are
    shard-local; the two observation segment-sums each psum (the per-CG-iter
    ICI/DCN crossings of SURVEY.md §3.2a).
    """
    n_cameras = Ul.shape[0]

    def matvec(x):
        y = jnp.einsum("cij,cj->ci", Ul, x)                       # U_λ x (replicated)
        wtx = jnp.einsum("oji,oj->oi", W, x[cam_idx])             # Wᵀx per obs (O,3)
        t = _pt_sum(wtx, pt_idx, n_points, axis_name, plans)      # (P,3)
        u = jnp.einsum("pij,pj->pi", Vinv, t)                     # V⁻¹ Wᵀ x
        z = jnp.einsum("oij,oj->oi", W, u[pt_idx])                # (O,dc)
        z = _cam_sum(z, cam_idx, n_cameras, axis_name, plans)
        return y - z

    return matvec


def back_substitute(B: BlockSystem, Vinv, dx_cam, axis_name=None, plans=None):
    """δ_p = V_λ⁻¹ (−g_p − Wᵀ δ_c) → (P, 3)."""
    wtd = jnp.einsum("oji,oj->oi", B.W, dx_cam[B.cam_idx])  # (O,3)
    n_points = B.V.shape[0]
    s = _pt_sum(wtd, B.pt_idx, n_points, axis_name, plans)
    return jnp.einsum("pij,pj->pi", Vinv, -B.gp - s)


def solve_schur_pcg(B: BlockSystem, lam, *, cg_max_iters: int, cg_tol: float,
                    diag_floor: float, diag_ceil: float, axis_name=None,
                    plans=None):
    """Full Schur+PCG linear solve. Returns (δ_cameras, δ_points, cg_iters)."""
    from tpu_ba.solver.pcg import pcg

    Ul, Vl = damp_blocks(B, lam, diag_floor, diag_ceil)
    Vinv = inv3x3(Vl)
    n_cameras, _, _ = Ul.shape
    n_points = Vl.shape[0]

    b = schur_rhs(B, Vinv, axis_name, plans)
    matvec = make_schur_matvec(Ul, B.W, Vinv, B.cam_idx, B.pt_idx, n_points,
                               axis_name, plans)

    # exact block-Jacobi preconditioner: inv of diag(S); batched unrolled
    # Gauss-Jordan (jnp.linalg.inv lowers to slow pivoted LU on TPU)
    from tpu_ba.solver.batched_linalg import inv_spd_small

    diag_S = Ul - w_vinv_wt_diag(B.W, Vinv, B.cam_idx, B.pt_idx, n_cameras,
                                 axis_name, plans)
    Minv = inv_spd_small(diag_S)

    def precond(r):
        return jnp.einsum("cij,cj->ci", Minv, r)

    dx_cam, cg_iters = pcg(matvec, b, precond, max_iters=cg_max_iters, tol=cg_tol)
    dx_pt = back_substitute(B, Vinv, dx_cam, axis_name, plans)
    return dx_cam, dx_pt, cg_iters
