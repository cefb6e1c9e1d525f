from .optim import make_optimizer, lr_schedule
from .state import TrainState, create_train_state
from .step import make_train_step
