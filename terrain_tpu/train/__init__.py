"""Training layer: losses, Lasagne-exact optimizers, the simultaneous
four-network train step, checkpointing, metrics, and the TwoStageGAN trainer
(the reference Pix2Pix equivalent)."""

from terrain_tpu.train.losses import TRAIN_KEYS, adv_loss, reconstruction_loss
from terrain_tpu.train.optim import adam, get_optimizer, rmsprop
from terrain_tpu.train.step import (
    ACTIVE,
    NET_NAMES,
    build_eval_step,
    build_train_step,
    forward_losses,
)

__all__ = [
    "TRAIN_KEYS",
    "adv_loss",
    "reconstruction_loss",
    "rmsprop",
    "adam",
    "get_optimizer",
    "build_train_step",
    "build_eval_step",
    "forward_losses",
    "NET_NAMES",
    "ACTIVE",
]
