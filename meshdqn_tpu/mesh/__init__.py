from .trimesh import TriMesh
from .xdmf import read_xdmf, write_xdmf
from .smooth import smooth
from .marking import (
    BoundaryMarkers,
    mark_boundaries,
    airfoil_polyline,
    WALLS,
    AIRFOIL,
    INFLOW,
    OUTFLOW,
    UNMARKED,
)

__all__ = [
    "TriMesh",
    "read_xdmf",
    "write_xdmf",
    "smooth",
    "BoundaryMarkers",
    "mark_boundaries",
    "airfoil_polyline",
    "WALLS",
    "AIRFOIL",
    "INFLOW",
    "OUTFLOW",
    "UNMARKED",
]
