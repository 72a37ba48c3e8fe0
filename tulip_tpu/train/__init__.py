from .step import TrainState, make_optimizer, make_train_step
from .engine import train_one_epoch
