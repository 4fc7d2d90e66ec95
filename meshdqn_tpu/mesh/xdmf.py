"""XDMF/HDF5 triangle-mesh I/O.

Reads the stock meshes of the reference unchanged (reference
flow_solver.py:59-62 reads them through dolfin's XDMFFile; the files
themselves are plain XDMF 3.0 + HDF5: geometry at `<h5>:/data0`, topology at
`<h5>:/data1`, see xdmf_files/*.xdmf).
"""
from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import h5py
import numpy as np

from .trimesh import TriMesh


def read_xdmf(path: str) -> TriMesh:
    """Load a triangle mesh from an XDMF file with HDF5 heavy data."""
    tree = ET.parse(path)
    root = tree.getroot()
    base = os.path.dirname(os.path.abspath(path))

    def _load(item) -> np.ndarray:
        text = item.text.strip()
        if item.get("Format", "HDF") == "HDF":
            h5path, dset = text.split(":", 1)
            if not os.path.isabs(h5path):
                h5path = os.path.join(base, h5path)
            with h5py.File(h5path, "r") as f:
                return f[dset][:]
        # Inline XML data.
        dims = [int(d) for d in re.split(r"\s+", item.get("Dimensions").strip())]
        return np.fromstring(text, sep=" ").reshape(dims)

    geom = root.find(".//Geometry/DataItem")
    topo = root.find(".//Topology/DataItem")
    if geom is None or topo is None:
        raise ValueError(f"{path}: no Geometry/Topology DataItem found")
    coords = np.asarray(_load(geom), dtype=np.float64)
    if coords.shape[1] == 3:  # XYZ geometry with zero z
        coords = coords[:, :2]
    cells = np.asarray(_load(topo), dtype=np.int32)
    return TriMesh(coords=coords, cells=cells)


def write_xdmf(path: str, mesh: TriMesh) -> None:
    """Write mesh in the same XDMF 3.0 + HDF5 layout the stock files use."""
    base, _ = os.path.splitext(path)
    h5name = os.path.basename(base) + ".h5"
    h5path = os.path.join(os.path.dirname(os.path.abspath(path)), h5name)
    with h5py.File(h5path, "w") as f:
        f.create_dataset("data0", data=mesh.coords)
        f.create_dataset("data1", data=mesh.cells.astype(np.int32))
        f.create_dataset("data2", data=np.zeros(len(mesh.cells), dtype=np.int32))
    V, C = mesh.num_vertices, mesh.num_cells
    xml = (
        '<Xdmf Version="3.0"><Domain><Grid Name="Grid">'
        f'<Geometry GeometryType="XY"><DataItem DataType="Float" Dimensions="{V} 2" '
        f'Format="HDF" Precision="8">{h5name}:/data0</DataItem></Geometry>'
        f'<Topology NodesPerElement="3" NumberOfElements="{C}" TopologyType="Triangle">'
        f'<DataItem DataType="Int" Dimensions="{C} 3" Format="HDF" Precision="4">'
        f"{h5name}:/data1</DataItem></Topology>"
        '<Attribute AttributeType="Scalar" Center="Cell" Name="name_to_read">'
        f'<DataItem DataType="Int" Dimensions="{C}" Format="HDF" Precision="4">'
        f"{h5name}:/data2</DataItem></Attribute>"
        "</Grid></Domain></Xdmf>"
    )
    with open(path, "w") as f:
        f.write(xml)
