from nflows_tpu.parallel.mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from nflows_tpu.parallel.train import (
    apply_tensor_parallelism,
    make_sharded_sampler,
    make_sharded_train_step,
    tensor_parallel_sharding,
)
