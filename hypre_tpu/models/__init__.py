from .laplacian import (
    laplacian_7pt,
    laplacian_7pt_row_block,
    laplacian_9pt,
    laplacian_27pt,
    difconv_7pt,
    laplacian_5pt_2d,
    sys_laplacian_7pt,
    rotate_7pt,
    vardifconv_7pt,
)
from .ij import IJMatrix, IJVector
