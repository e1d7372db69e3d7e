from vidil_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from vidil_tpu.parallel.sharding import (
    apply_optimizer_sharding,
    model_partition_spec,
    shard_params,
    zero1_partition_spec,
    zero1_shard_opt_state,
)
