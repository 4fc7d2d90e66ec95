from .remove import RemovalResult, RemovalStatus, remove_vertex

__all__ = ["RemovalResult", "RemovalStatus", "remove_vertex"]
