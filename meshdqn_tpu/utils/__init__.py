from .config import (
    AgentConfig,
    Config,
    EpsilonConfig,
    FlowConfig,
    OptimizerConfig,
)

__all__ = [
    "AgentConfig",
    "Config",
    "EpsilonConfig",
    "FlowConfig",
    "OptimizerConfig",
]
