from pyrmt_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    make_sharded_step,
    shard_state,
    state_sharding,
)
