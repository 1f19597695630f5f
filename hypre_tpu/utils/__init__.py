from .lcg import HypreLCG, lcg_fill, lcg_skip
from .config import Config, default_config, real_dtype, int_dtype
from .malloc_tuning import tune_host_malloc
from .errors import (HypreError, ConvergenceWarning, arg_error,
                     check_error, clear_errors, debug_assert,
                     describe_error, get_error, set_error)
from .timing import Timer, timed, named_scope
