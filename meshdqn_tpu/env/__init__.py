from .airfoil_env import AirfoilEnv, GroundTruth, StepInfo, compute_ground_truth
from .graph import GraphState, build_graph_state, polyline_distance

__all__ = [
    "AirfoilEnv",
    "GroundTruth",
    "StepInfo",
    "compute_ground_truth",
    "GraphState",
    "build_graph_state",
    "polyline_distance",
]
