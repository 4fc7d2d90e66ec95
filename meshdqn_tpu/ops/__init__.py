from .sparse import EllMatrix, ell_matvec
from .convection import ConvectionKernel, convection_vector

__all__ = ["EllMatrix", "ell_matvec", "ConvectionKernel", "convection_vector"]
