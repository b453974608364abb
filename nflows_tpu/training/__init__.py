from nflows_tpu.training.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from nflows_tpu.training.fused import fused_trainer
from nflows_tpu.training.loop import run_training
from nflows_tpu.training.train import (
    TrainState,
    create_train_state,
    make_scan_train_step,
    make_train_step,
    nll_loss,
)
