from .sparse import EllMatrix, ell_matvec
from .banded import BandedMatrix, rcm_permutation
from .convection import ConvectionKernel, convection_vector

__all__ = ["EllMatrix", "ell_matvec", "ConvectionKernel", "convection_vector"]
