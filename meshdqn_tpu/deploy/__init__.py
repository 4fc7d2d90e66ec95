from .deployer import Deployer, DeployOptions, DeployResult, run_sim
from .viz import plot_mesh, plot_state, vertex_plot

__all__ = [
    "Deployer",
    "DeployOptions",
    "DeployResult",
    "run_sim",
    "plot_mesh",
    "plot_state",
    "vertex_plot",
]
