"""Training runtime: config presets, losses, the sharded train step, loop."""

from gif_tpu.train.config import TrainConfig, get_config
from gif_tpu.train.state import TrainState, create_train_state
from gif_tpu.train.step import make_train_step

__all__ = [
    "TrainConfig",
    "get_config",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
