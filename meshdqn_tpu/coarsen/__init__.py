from .cavity import (
    cavity_fill_jax,
    delaunay_ear_fill,
    extract_cavity,
    remove_vertex_cavity,
)
from .remove import RemovalResult, RemovalStatus, remove_vertex

__all__ = [
    "RemovalResult",
    "RemovalStatus",
    "remove_vertex",
    "remove_vertex_cavity",
    "extract_cavity",
    "delaunay_ear_fill",
    "cavity_fill_jax",
]
