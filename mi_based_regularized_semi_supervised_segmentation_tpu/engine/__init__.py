from .optim import build_optimizer, lr_at_epoch
from .state import TrainState, init_train_state
from .steps import build_train_step, build_eval_step
from .trainer import (
    SemiTrainer,
    UDATrainer,
    IICTrainer,
    UDAIICTrainer,
    trainer_zoos,
)
from .pretrain import (
    ContrastTrainer,
    ContrastTrainerMT,
    IICContrastTrainer,
    pretrain_zoos,
)

__all__ = [
    "build_optimizer",
    "lr_at_epoch",
    "TrainState",
    "init_train_state",
    "build_train_step",
    "build_eval_step",
    "SemiTrainer",
    "UDATrainer",
    "IICTrainer",
    "UDAIICTrainer",
    "trainer_zoos",
    "ContrastTrainer",
    "ContrastTrainerMT",
    "IICContrastTrainer",
    "pretrain_zoos",
]
