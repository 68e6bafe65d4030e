"""Pallas TPU kernels (reference §2.6 items 3-4: custom device kernels +
vendor-BLAS slots)."""

from . import spmv
from . import elementwise
from . import matmul
