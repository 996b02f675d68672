"""tpu-ba — TPU-native bundle adjustment, SfM, and pose-graph optimization.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``caomw/BundleAdjustmentMatlab`` (reference mounted at /root/reference; empty at
survey and build time — see SURVEY.md §0). The functional contract is the one in
SURVEY.md §1.2: reprojection residuals, analytic camera/point Jacobian blocks,
Levenberg–Marquardt over the sparse normal equations with Schur-complement
elimination of points, PCG on the reduced camera system, robust kernels,
radial-distortion intrinsics refinement, BAL problem support, an SfM frontend,
pose-graph refinement, and multi-device/multi-host sharded BA.

Everything on the compute path is jit-compatible, shape-static, and written for
the TPU compilation model: batched einsums on the MXU, segment-sums for the
block-sparse assembly, ``lax.while_loop`` control flow (no host round-trips
inside the optimizer), and Pallas kernels for the hot block-sparse paths.
"""

__version__ = "0.2.0"

import os as _os

import jax as _jax

# On TPU, f32 matmuls/einsums default to ONE bf16 pass (8-bit mantissa on the
# MXU) — catastrophic for normal-equation assembly and the one-hot segment-sum
# kernels (measured: 22% final-cost error on ladybug-1723 in round 1's solver
# sweep, scripts/solver_compare.json). Bundle adjustment is conditioning-
# limited, not matmul-FLOP-limited, so full f32 multiply precision is the
# correct production default.
# Override with TPU_BA_MATMUL_PRECISION=default|high|highest if ever needed.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("TPU_BA_MATMUL_PRECISION", "highest"),
)

from tpu_ba.core import BAProblem, LMConfig, LMResult, make_problem  # noqa: F401
