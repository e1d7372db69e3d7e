from vidil_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from vidil_tpu.parallel.sharding import model_partition_spec, shard_params
