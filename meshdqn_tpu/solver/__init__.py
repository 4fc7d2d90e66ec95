from .ipcs import IPCSSolver, IPCSConfig, FlowState

__all__ = ["IPCSSolver", "IPCSConfig", "FlowState"]
