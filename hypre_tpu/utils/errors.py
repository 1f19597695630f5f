"""Error propagation — the hypre_error.h analog.

The reference keeps a process-global error flag with bitmask codes and
query/clear entry points (utilities/hypre_error.h:18-31: HYPRE_GetError,
HYPRE_CheckError, HYPRE_DescribeError, HYPRE_ClearAllErrors,
hypre_error_w_msg capturing file/line, hypre_assert under
--enable-debug).  In a functional JAX framework, errors inside jitted
code are carried as data (converged flags, NaN guards in solver state);
host-side errors raise HypreError AND set the global flag so callers
using the reference's flag-polling style keep working.
"""

from __future__ import annotations

import os

GENERIC = 1
MEMORY = 2
ARG = 4
CONV = 256  # solver did not converge

_error_flag: int = 0


def set_error(code: int, msg: str | None = None) -> int:
    """Record `code` in the global flag (hypre_error_handler,
    hypre_error.h:24) without raising — the reference's style for
    recoverable conditions (e.g. non-convergence).  Returns the code."""
    global _error_flag
    _error_flag |= int(code)
    return int(code)


def get_error() -> int:
    """HYPRE_GetError: the accumulated bitmask (0 = no error)."""
    return _error_flag


def check_error(ierr: int, code: int) -> bool:
    """HYPRE_CheckError: does `ierr` contain `code`?"""
    return bool(int(ierr) & int(code))


def clear_errors() -> None:
    """HYPRE_ClearAllErrors."""
    global _error_flag
    _error_flag = 0


def describe_error(code: int) -> str:
    """HYPRE_DescribeError (hypre_error.c)."""
    if code == 0:
        return "[No error] "
    parts = []
    if code & GENERIC:
        parts.append("[Generic error] ")
    if code & MEMORY:
        parts.append("[Memory error] ")
    if code & ARG:
        parts.append("[Invalid argument] ")
    if code & CONV:
        parts.append("[Method did not converge] ")
    return "".join(parts) or "[Unknown error code] "


class HypreError(RuntimeError):
    """Raised for host-side errors; constructing one also records its
    code in the global flag (hypre_error_w_msg does both)."""

    GENERIC = GENERIC
    MEMORY = MEMORY
    ARG = ARG
    CONV = CONV

    def __init__(self, msg: str, code: int = GENERIC):
        super().__init__(msg)
        self.code = int(code)
        set_error(self.code)


def arg_error(msg: str) -> HypreError:
    """hypre_error_in_arg analog: build (and record) an ARG error —
    `raise arg_error(f"unknown {x}")` at validation sites."""
    return HypreError(msg, ARG)


def generic_error(msg: str) -> HypreError:
    """hypre_error_w_msg(HYPRE_ERROR_GENERIC, ...) analog."""
    return HypreError(msg, GENERIC)


class ConvergenceWarning(UserWarning):
    pass


# --------------------------------------------------------------------
# hypre_assert analog: active when HYPRE_TPU_DEBUG is set (the
# --enable-debug build flag); free otherwise.
_DEBUG = bool(int(os.environ.get("HYPRE_TPU_DEBUG", "0") or "0"))


def debug_enabled() -> bool:
    return _DEBUG


def debug_assert(cond, msg: str = "") -> None:
    """hypre_assert (hypre_error.h:31): fatal in debug builds, no-op
    otherwise.  Host-side values only — inside jits carry checks as
    data instead."""
    if _DEBUG and not cond:
        raise HypreError(f"hypre_assert failed: {msg}", GENERIC)
