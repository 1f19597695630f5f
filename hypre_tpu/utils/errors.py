"""Error propagation (the hypre_error.h analog).

The reference keeps a global error flag with bitmask codes
(utilities/hypre_error.h:18-31).  In a functional JAX framework errors
inside jitted code are carried as data (converged flags, NaN guards in
solver state); host-side setup errors raise HypreError.
"""


class HypreError(RuntimeError):
    GENERIC = 1
    MEMORY = 2
    ARG = 4
    CONV = 256  # solver did not converge

    def __init__(self, msg: str, code: int = 1):
        super().__init__(msg)
        self.code = code


class ConvergenceWarning(UserWarning):
    pass
