from agrl_tpu.engine.train_state import TrainState, create_train_state
from agrl_tpu.engine.trainer import make_train_step

__all__ = ["TrainState", "create_train_state", "make_train_step"]
