"""Dense normal-equation solver — the correctness oracle for the Schur path.

Parity note: this *is* the reference's algorithm — assemble the full damped
normal equations and solve them directly ("backslash normal-equation solve",
BASELINE.json:5) — kept as the test oracle and for tiny problems. The
production path is tpu_ba/solver/schur.py + pcg.py (SURVEY.md §4.2: "Schur
path vs dense solve of the full augmented H on tiny problems").
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_ba.solver.normal import BlockSystem, damp_blocks


def dense_hessian(B: BlockSystem, lam, diag_floor: float, diag_ceil: float):
    """Materialize the damped H ((C·dc+3P) square) and gradient g from blocks.

    Test-oracle path: converts the lane-major blocks (W (3dc,O), V (9,P))
    back to AoS for the scatter — fine on tiny CPU problems.
    """
    C, dc, _ = B.U.shape
    P = B.V.shape[-1]
    O = B.W.shape[-1]
    n = C * dc + P * 3
    Ul, Vl_t = damp_blocks(B, lam, diag_floor, diag_ceil)
    Vl = Vl_t.T.reshape(P, 3, 3)
    W_aos = B.W.T.reshape(O, dc, 3)

    H = jnp.zeros((n, n), B.U.dtype)
    ar_dc = jnp.arange(dc)
    ar3 = jnp.arange(3)
    arC = jnp.arange(C)
    arP = jnp.arange(P)

    ci = arC[:, None, None] * dc + ar_dc[None, :, None]
    cj = arC[:, None, None] * dc + ar_dc[None, None, :]
    H = H.at[ci, cj].add(Ul)

    pi = C * dc + arP[:, None, None] * 3 + ar3[None, :, None]
    pj = C * dc + arP[:, None, None] * 3 + ar3[None, None, :]
    H = H.at[pi, pj].add(Vl)

    oi = B.cam_idx[:, None, None] * dc + ar_dc[None, :, None]
    oj = C * dc + B.pt_idx[:, None, None] * 3 + ar3[None, None, :]
    H = H.at[oi, oj].add(W_aos)
    H = H.at[oj.transpose(0, 2, 1), oi.transpose(0, 2, 1)].add(
        jnp.swapaxes(W_aos, -1, -2)
    )

    g = jnp.concatenate([B.gc.reshape(-1), B.gp.T.reshape(-1)])
    return H, g


def solve_dense(B: BlockSystem, lam, diag_floor: float = 1e-6, diag_ceil: float = 1e32):
    """Solve the damped normal equations H δ = −g directly.

    Returns (δ_cameras (C, dc), δ_points (P, 3)).
    """
    C, dc, _ = B.U.shape
    P = B.V.shape[-1]
    H, g = dense_hessian(B, lam, diag_floor, diag_ceil)
    delta = jnp.linalg.solve(H, -g)
    return delta[: C * dc].reshape(C, dc), delta[C * dc:].reshape(P, 3)
