from .pcg import pcg, PCGOptions
from .gmres import gmres, GMRESOptions
from .bicgstab import bicgstab, BiCGSTABOptions
from .flexgmres import flexgmres, FlexGMRESOptions
from .cogmres import cogmres, COGMRESOptions
from .lgmres import lgmres, LGMRESOptions
from .cgnr import cgnr, CGNROptions
from .common import SolverResult
