from .optimizer import build_optimizer, trainable_mask  # noqa: F401
from .step import build_train_step, make_train_state  # noqa: F401
