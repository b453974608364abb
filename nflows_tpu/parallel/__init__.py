from nflows_tpu.parallel.mesh import (
    data_sharding,
    initialize_distributed,
    make_mesh,
    replicated,
    shard_batch,
)
from nflows_tpu.parallel.elementwise import make_feature_sharded_elementwise
from nflows_tpu.parallel.fsdp import apply_fsdp, fsdp_sharding
from nflows_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    make_pipelined_transform,
    stack_transforms,
)
from nflows_tpu.parallel.smc import make_sharded_smc
from nflows_tpu.parallel.train import (
    apply_tensor_parallelism,
    make_gspmd_train_step,
    make_sharded_sampler,
    make_sharded_train_step,
    tensor_parallel_sharding,
)
from nflows_tpu.parallel.vi import (
    effective_sample_size,
    elbo_loss,
    importance_weighted_bound,
    make_sharded_vi_step,
    sharded_importance_weights,
)
