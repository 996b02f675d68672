from tpu_ba.sharding.distributed import (  # noqa: F401
    make_mesh,
    shard_problem,
    solve_sharded,
)
