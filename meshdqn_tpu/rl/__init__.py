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
)
from .replay import ReplayBuffer, TransitionBatch

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
    "ReplayBuffer",
    "TransitionBatch",
]
