"""Camera projection models.

Two models cover the framework's capability surface (SURVEY.md §2.2 N1):

* **BAL model** (9 params / camera): ``[aa(3), t(3), f, k1, k2]`` with the
  Bundle-Adjustment-in-the-Large convention::

      P  = R(aa) · X + t          # world → camera
      p  = -P_xy / P_z            # perspective division (note the minus:
                                  #  BAL cameras look down -z)
      r  = 1 + k1·|p|² + k2·|p|⁴  # radial distortion
      u  = f · r · p              # pixel coordinates (origin at center)

  This is the model the BAL problem files (Ladybug / Trafalgar / Venice —
  BASELINE.json configs 2,3,5) are calibrated for, and it exercises the
  radial-distortion intrinsics-refinement capability (BASELINE.json:9).

* **Pinhole fixed-K model** (6 params / camera): ``[aa(3), t(3)]`` with a
  per-camera constant intrinsics row ``[fx, fy, cx, cy]`` and a +z optical
  axis; used by the SfM frontend and the synthetic scenes.

All functions are scalar-per-observation and designed to be ``vmap``-ed over
the observation axis; XLA fuses the whole chain into one elementwise kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_ba.geometry.rotations import rotate_aa

BAL_CAM_DIM = 9
PINHOLE_CAM_DIM = 6


def world_to_cam_bal(cam, X):
    """World point (3,) → camera frame (3,) for the BAL model. cam: (9,)."""
    return rotate_aa(cam[..., 0:3], X) + cam[..., 3:6]


def project_bal(cam, X):
    """BAL projection. cam: (..., 9), X: (..., 3) → pixel (..., 2).

    Division is NaN-guarded so padded observations (X behind or at the camera
    plane) produce finite garbage that the observation mask kills downstream.
    """
    P = world_to_cam_bal(cam, X)
    z = P[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, jnp.full_like(z, 1e-12), z)
    p = -P[..., 0:2] / z_safe
    s = jnp.sum(p * p, axis=-1, keepdims=True)
    r = 1.0 + s * (cam[..., 7:8] + s * cam[..., 8:9])
    return cam[..., 6:7] * r * p


def camera_center_bal(cam):
    """Optical center C = -Rᵀ t of a BAL camera. cam: (..., 9) → (..., 3)."""
    return rotate_aa(-cam[..., 0:3], -cam[..., 3:6])


def project_pinhole(cam, K, X):
    """Pinhole fixed-K projection. cam: (..., 6), K: (..., 4) [fx fy cx cy],
    X: (..., 3) → pixel (..., 2). Looks down +z."""
    P = rotate_aa(cam[..., 0:3], X) + cam[..., 3:6]
    z = P[..., 2:3]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, jnp.full_like(z, 1e-12), z)
    p = P[..., 0:2] / z_safe
    return p * K[..., 0:2] + K[..., 2:4]
