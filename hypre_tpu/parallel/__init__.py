from .mesh import make_mesh, default_mesh
from .partition import block_partition
from .halo import HaloPlan
from .par_csr import ParCSR
from .par_dia import ParDIA
from .par_vector import ParVector, par_dot, par_norm
