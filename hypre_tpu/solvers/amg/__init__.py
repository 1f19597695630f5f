from .strength import strength_matrix
from .coarsen import pmis_coarsen, ruge_stuben_coarsen, hmis_coarsen, cljp_coarsen, C_PT, F_PT, SF_PT
from .interp import classical_interp, direct_interp, extended_i_interp, truncate_interp
from .boomeramg import BoomerAMG, BoomerAMGOptions
from .hybrid import AMGHybrid, AMGHybridOptions
from .ams import AMS, AMSOptions
from .amgdd import AMGDD, AMGDDOptions
from .block_amg import BlockAMG, BlockAMGOptions, BlockELL, block_spmv, bsr_to_block_ell
from .ilu import ILU, ILUOptions, SchurILU, SchurILUOptions
from .parasails import ParaSails, ParaSailsOptions
