"""Training engine: config, state, jitted step, schedules, replay
buffer, checkpointing, eval, and the epoch loop."""

from ficsr_tpu.train.config import TrainConfig, parse_args
from ficsr_tpu.train.state import TrainState, create_train_state, make_optimizer
from ficsr_tpu.train.step import build_train_step, generator_forward
from ficsr_tpu.train.replay import ReplayBufferState, push_and_pop, replay_init
from ficsr_tpu.train.schedule import cosine_annealing, lambda_linear_decay

__all__ = [
    "TrainConfig", "parse_args", "TrainState", "create_train_state",
    "make_optimizer", "build_train_step", "generator_forward",
    "ReplayBufferState", "push_and_pop", "replay_init",
    "cosine_annealing", "lambda_linear_decay",
]
