from .config import (
    AgentConfig,
    Config,
    EpsilonConfig,
    FlowConfig,
    OptimizerConfig,
)
from .profiling import Timer, force_sync, timed, trace

__all__ = [
    "AgentConfig",
    "Config",
    "EpsilonConfig",
    "FlowConfig",
    "OptimizerConfig",
    "Timer",
    "force_sync",
    "timed",
    "trace",
]
