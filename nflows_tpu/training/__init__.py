from nflows_tpu.training.train import (
    TrainState,
    create_train_state,
    make_train_step,
    nll_loss,
)
