from human_dynamics_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
)
from human_dynamics_tpu.parallel.multihost import (
    initialize as initialize_multihost,
    process_env,
)
