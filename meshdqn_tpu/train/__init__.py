from .checkpoint import CheckpointManager
from .metrics import MetricsRecorder
from .trainer import Trainer, TrainerState

__all__ = ["CheckpointManager", "MetricsRecorder", "Trainer", "TrainerState"]
