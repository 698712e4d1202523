"""Pallas TPU kernels: the native-kernel tier of the operator layer
(SURVEY.md §2 — SpMV/stencil matvecs; the reference's BLAS/LAPACK analogue)."""

from .stencil import (auto_poisson2d, stencil_matvec, stencil_matvec_2d,
                      PallasPoisson2D)
from .spmv import BellMatrix, bell_from_scipy, bell_spmv, BellOperator

__all__ = [
    "auto_poisson2d",
    "stencil_matvec",
    "stencil_matvec_2d",
    "PallasPoisson2D",
    "BellMatrix",
    "bell_from_scipy",
    "bell_spmv",
    "BellOperator",
]
