from .actions import analyze_actions
from .benchmark import (
    benchmark_figure,
    improvement_figure,
    load_sweep,
    run_resolution_sweep,
    sweep_overlay_figure,
)
from .reward import movingaverage, plot_reward

__all__ = [
    "analyze_actions",
    "benchmark_figure",
    "improvement_figure",
    "load_sweep",
    "run_resolution_sweep",
    "sweep_overlay_figure",
    "movingaverage",
    "plot_reward",
]
