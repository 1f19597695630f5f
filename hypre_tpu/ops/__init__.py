from .csr import CSRMatrix, ELLMatrix
from .spmv import ell_spmv, csr_spmv_host
from . import blas1
