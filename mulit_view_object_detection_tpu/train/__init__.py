from .optim import make_optimizer  # noqa: F401
from .step import (TrainState, create_train_state, lr_schedule,  # noqa: F401
                   make_eval_step, make_train_step)
from .trainable import trainable_mask  # noqa: F401
