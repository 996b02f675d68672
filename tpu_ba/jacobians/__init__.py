from tpu_ba.jacobians.autodiff import jacobian_blocks_bal_autodiff  # noqa: F401
from tpu_ba.jacobians.analytic import jacobian_blocks_bal  # noqa: F401
