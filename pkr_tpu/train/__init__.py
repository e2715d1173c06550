"""pjit training engine: state, steps, loop, checkpointing."""

from pkr_tpu.train.state import TrainState, create_train_state, cosine_epoch_lr
from pkr_tpu.train.loop import make_train_step, make_eval_step, train_and_validate
from pkr_tpu.train.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    import_torch_checkpoint,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "cosine_epoch_lr",
    "make_train_step",
    "make_eval_step",
    "train_and_validate",
    "save_checkpoint",
    "restore_checkpoint",
    "import_torch_checkpoint",
]
