from .schedules import cosine_scheduler, linear_scheduler, piecewise_scheduler
from .factory import create_optimizer
from .ema import ema_update, init_ema
