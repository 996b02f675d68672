from tpu_ba.kernels.segsum import (  # noqa: F401
    SegsumPlan,
    build_segsum_plan,
    sorted_segment_sum,
)
