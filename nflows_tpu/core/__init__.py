from nflows_tpu.core.module import (
    Module,
    buffer,
    combine,
    field,
    is_trainable_leaf,
    partition,
    set_training,
    static,
)
from nflows_tpu.core.stochastic import has_stochastic_context, next_rng_key, stochastic
