from .logger import MetricLogger, SmoothedValue, setup_for_distributed
from .lr_sched import adjust_learning_rate, lr_at_epoch
from . import checkpoint
