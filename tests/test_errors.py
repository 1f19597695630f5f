"""Error system — the hypre_error.h analog (utilities/hypre_error.h:18-31).

Reference semantics: a process-global bitmask flag accumulated by
hypre_error_handler, queried with HYPRE_GetError / HYPRE_CheckError,
described by HYPRE_DescribeError, cleared by HYPRE_ClearAllErrors;
hypre_assert active only in debug builds."""

import numpy as np
import pytest

from hypre_tpu.utils import errors as E
from hypre_tpu.utils.errors import HypreError, arg_error


@pytest.fixture(autouse=True)
def _clean_flag():
    E.clear_errors()
    yield
    E.clear_errors()


def test_flag_accumulates_and_describes():
    assert E.get_error() == 0
    E.set_error(E.CONV)
    E.set_error(E.ARG)
    assert E.check_error(E.get_error(), E.CONV)
    assert E.check_error(E.get_error(), E.ARG)
    assert not E.check_error(E.get_error(), E.MEMORY)
    d = E.describe_error(E.get_error())
    assert "converge" in d and "argument" in d
    E.clear_errors()
    assert E.get_error() == 0
    assert E.describe_error(0) == "[No error] "


def test_raise_records_flag():
    with pytest.raises(HypreError):
        raise arg_error("bad knob")
    assert E.check_error(E.get_error(), E.ARG)


def test_invalid_coarsen_type_sets_arg_flag():
    from hypre_tpu.models import laplacian_7pt
    from hypre_tpu.solvers.amg import BoomerAMG, BoomerAMGOptions

    A = laplacian_7pt(4, 4, 4)
    with pytest.raises(HypreError):
        BoomerAMG(A, BoomerAMGOptions(coarsen_type="not-a-coarsener"))
    assert E.check_error(E.get_error(), E.ARG)


def test_debug_assert_gated(monkeypatch):
    monkeypatch.setattr(E, "_DEBUG", False)
    E.debug_assert(False, "never fires")  # no-op without debug
    monkeypatch.setattr(E, "_DEBUG", True)
    E.debug_assert(True, "fine")
    with pytest.raises(HypreError):
        E.debug_assert(False, "boom")
