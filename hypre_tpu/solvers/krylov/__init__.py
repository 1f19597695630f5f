from .pcg import pcg, PCGOptions
from .gmres import gmres, GMRESOptions
from .bicgstab import bicgstab, BiCGSTABOptions
from .common import SolverResult
