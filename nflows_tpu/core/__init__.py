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
