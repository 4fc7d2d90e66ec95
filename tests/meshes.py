"""Shared synthetic meshes for tests."""
import numpy as np

from meshdqn_tpu.mesh import TriMesh


def unit_square_mesh(n=4):
    """Structured n x n unit-square triangulation."""
    xs = np.linspace(0, 1, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)
    cells = []
    for i in range(n):
        for j in range(n):
            v00 = i * (n + 1) + j
            v10 = (i + 1) * (n + 1) + j
            v01 = i * (n + 1) + j + 1
            v11 = (i + 1) * (n + 1) + j + 1
            cells.append([v00, v10, v11])
            cells.append([v00, v11, v01])
    return TriMesh(coords=coords, cells=np.array(cells, dtype=np.int32))


def channel_mesh(nx=36, ny=12):
    """Structured mesh of the reference channel box [-0.5, 3] x [-0.5, 0.5]
    WITHOUT an airfoil — useful for exact-solution (Poiseuille) tests."""
    xs = np.linspace(-0.5, 3.0, nx + 1)
    ys = np.linspace(-0.5, 0.5, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)
    cells = []
    for i in range(nx):
        for j in range(ny):
            v00 = i * (ny + 1) + j
            v10 = (i + 1) * (ny + 1) + j
            v01 = i * (ny + 1) + j + 1
            v11 = (i + 1) * (ny + 1) + j + 1
            cells.append([v00, v10, v11])
            cells.append([v00, v11, v01])
    return TriMesh(coords=coords, cells=np.array(cells, dtype=np.int32))
