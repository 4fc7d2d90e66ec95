from .dqn import (
    DQNConfig,
    DQNState,
    dqn_loss,
    epsilon,
    init_dqn,
    make_optimizer,
    select_action,
    select_actions_batched,
    train_step,
    train_step_many,
)
from .replay import ReplayBuffer, TransitionBatch, stack_batches

__all__ = [
    "DQNConfig",
    "DQNState",
    "dqn_loss",
    "epsilon",
    "init_dqn",
    "make_optimizer",
    "select_action",
    "select_actions_batched",
    "train_step",
    "train_step_many",
    "ReplayBuffer",
    "stack_batches",
    "TransitionBatch",
]
