from .state import TrainState, create_train_state
from .step import build_train_step, build_eval_step
from .loop import train_one_epoch, evaluate
