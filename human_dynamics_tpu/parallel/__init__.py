from human_dynamics_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
)
