from focnerf_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from focnerf_tpu.parallel.sharding import make_sharded_train_step
