from .config import (
    AgentConfig,
    Config,
    EpsilonConfig,
    FlowConfig,
    OptimizerConfig,
)
from .jsonlog import JsonLogger, read_jsonl
from .profiling import Timer, force_sync, timed, trace

__all__ = [
    "JsonLogger",
    "read_jsonl",
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
