"""Autodiff Jacobian blocks — the correctness oracle.

``jax.jacfwd`` over the per-observation projection gives the exact 2×9 camera
block and 2×3 point block; the hand-derived blocks in
:mod:`tpu_ba.jacobians.analytic` are tested against these (SURVEY.md §4.1:
"the single most bug-catching test in BA").

Capability parity: "analytic Jacobian construction (camera + point blocks)"
(BASELINE.json:5, SURVEY.md §2.1 R2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_ba.geometry.cameras import project_bal


def _proj(cam, X, obs):
    return project_bal(cam, X) - obs


_jac_cam = jax.vmap(jax.jacfwd(_proj, argnums=0), in_axes=(0, 0, 0), out_axes=-1)
_jac_pt = jax.vmap(jax.jacfwd(_proj, argnums=1), in_axes=(0, 0, 0), out_axes=-1)


def jacobian_blocks_bal_autodiff(cameras, points, obs_2d, cam_idx, pt_idx, mask=None):
    """Returns lane-major (r (2,O), Jc (2,9,O), Jp (2,3,O)); masked
    observations zeroed — same layout as the analytic fast path."""
    cam = cameras[cam_idx]
    X = points[pt_idx]
    r = _proj(cam, X, obs_2d).T
    Jc = _jac_cam(cam, X, obs_2d)
    Jp = _jac_pt(cam, X, obs_2d)
    if mask is not None:
        r = jnp.where(mask[None, :], r, 0.0)
        Jc = jnp.where(mask[None, None, :], Jc, 0.0)
        Jp = jnp.where(mask[None, None, :], Jp, 0.0)
    return r, Jc, Jp
