from .kd import KDModels, KDState, kd_loss, make_train_step
from .optim import make_lr_schedule, make_optimizer
from .trainer import KDTrainer

__all__ = ["KDModels", "KDState", "kd_loss", "make_train_step",
           "make_lr_schedule", "make_optimizer", "KDTrainer"]
