from zigma_tpu.train.state import (
    LATENT_SCALE,
    TrainState,
    create_chained_train_step,
    create_optimizer,
    create_train_step,
    make_diffusion_loss_fn,
    update_ema,
)
from zigma_tpu.train.checkpoints import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

__all__ = [
    "LATENT_SCALE",
    "TrainState",
    "create_chained_train_step",
    "create_optimizer",
    "create_train_step",
    "make_diffusion_loss_fn",
    "update_ema",
    "latest_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
]
