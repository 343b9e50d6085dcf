from spgan_tpu.train.state import TrainState, create_train_state, ema_update  # noqa: F401
from spgan_tpu.train.step import make_train_step  # noqa: F401
