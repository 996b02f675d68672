from tpu_ba.sharding.distributed import (  # noqa: F401
    make_mesh,
    shard_problem,
    solve_sharded,
)
from tpu_ba.sharding.multihost import init_distributed, scaling_report  # noqa: F401
