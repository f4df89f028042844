from .metrics import SmoothedValue, MetricLogger
from .loggers import TensorboardLogger, WandbLogger
