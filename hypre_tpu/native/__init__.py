"""Native host-setup kernels (ctypes-bound C, compiled on first use).

The reference's setup path is native C throughout; the two Python-loop
hot spots here (GS wavefront levels, RS coarsening first pass) are
rebuilt in C and compiled with the system compiler to a cached shared
object.  Falls back to the pure-Python implementations when no compiler
is available, so the package never hard-depends on a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "kernels.c")
_SO = os.path.join(_HERE, "_kernels.so")

_lib = None
_tried = False


def _build() -> bool:
    # compile to a private temp path, then os.rename (atomic within the
    # directory): concurrent processes may rebuild simultaneously after
    # a source change, and dlopening a half-written .so segfaults
    tmp = f"{_SO}.{os.getpid()}.tmp"
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
                capture_output=True,
                timeout=120,
            )
            if r.returncode == 0:
                os.replace(tmp, _SO)
                return True
        except (FileNotFoundError, subprocess.TimeoutExpired, OSError):
            continue
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    I64 = ctypes.POINTER(ctypes.c_int64)
    lib.gs_levels.argtypes = [I64, I64, ctypes.c_int64, ctypes.c_int, I64]
    lib.gs_levels.restype = None
    lib.rs_coarsen.argtypes = [I64, I64, I64, I64, ctypes.c_int64, I64]
    lib.rs_coarsen.restype = None
    U8 = ctypes.POINTER(ctypes.c_uint8)
    F64 = ctypes.POINTER(ctypes.c_double)
    lib.trunc_keep.argtypes = [I64, I64, F64, ctypes.c_int64, ctypes.c_int64, U8]
    lib.trunc_keep.restype = None
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gs_levels(indptr, indices, n: int, forward: bool):
    """level[i] per the par_relax.c wavefront DAG; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    level = np.zeros(n, dtype=np.int64)
    lib.gs_levels(_ptr(indptr), _ptr(indices), n, int(forward), _ptr(level))
    return level


def rs_coarsen(S_indptr, S_indices, ST_indptr, ST_indices, n: int):
    lib = _load()
    if lib is None:
        return None
    args = [
        np.ascontiguousarray(x, dtype=np.int64)
        for x in (S_indptr, S_indices, ST_indptr, ST_indices)
    ]
    cf = np.zeros(n, dtype=np.int64)
    lib.rs_coarsen(*(_ptr(a) for a in args), n, _ptr(cf))
    return cf


def available() -> bool:
    return _load() is not None


def cljp_coarsen(S_indptr, S_indices, n: int, measure):
    """CLJP coarsening; returns cf or None without a compiler.
    S_indices and measure are consumed (copied internally)."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "cljp_coarsen_bound"):
        I64 = _ct.POINTER(_ct.c_int64)
        D = _ct.POINTER(_ct.c_double)
        lib.cljp_coarsen.argtypes = [I64, I64, _ct.c_int64, D, I64]
        lib.cljp_coarsen.restype = None
        lib.cljp_coarsen_bound = True
    indptr = np.ascontiguousarray(S_indptr, dtype=np.int64)
    indices = np.ascontiguousarray(S_indices, dtype=np.int64).copy()
    meas = np.ascontiguousarray(measure, dtype=np.float64).copy()
    cf = np.zeros(n, dtype=np.int64)
    lib.cljp_coarsen(
        _ptr(indptr),
        _ptr(indices),
        n,
        meas.ctypes.data_as(__import__("ctypes").POINTER(__import__("ctypes").c_double)),
        _ptr(cf),
    )
    return cf


def ext_pi_interp(A, S, cf):
    """Native ext+i fill; returns scipy COO triplets or None."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "ext_pi_bound"):
        I64 = _ct.POINTER(_ct.c_int64)
        D = _ct.POINTER(_ct.c_double)
        lib.ext_pi_interp.argtypes = [I64, I64, D, I64, I64, I64,
                                      _ct.c_int64, I64, I64, D, _ct.c_int64]
        lib.ext_pi_interp.restype = _ct.c_int64
        lib.ext_pi_bound = True
    import ctypes

    n = A.shape[0]
    ai = np.ascontiguousarray(A.indptr, dtype=np.int64)
    aj = np.ascontiguousarray(A.indices, dtype=np.int64)
    ad = np.ascontiguousarray(A.data, dtype=np.float64)
    si = np.ascontiguousarray(S.indptr, dtype=np.int64)
    sj = np.ascontiguousarray(S.indices, dtype=np.int64)
    cfa = np.ascontiguousarray(cf, dtype=np.int64)
    cap = max(int(A.nnz * 4), 16)
    for _ in range(3):
        rows = np.zeros(cap, dtype=np.int64)
        cols = np.zeros(cap, dtype=np.int64)
        vals = np.zeros(cap, dtype=np.float64)
        dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        nnz = lib.ext_pi_interp(
            _ptr(ai), _ptr(aj), dptr(ad), _ptr(si), _ptr(sj), _ptr(cfa),
            n, _ptr(rows), _ptr(cols), dptr(vals), cap,
        )
        if nnz <= cap:
            return rows[:nnz], cols[:nnz], vals[:nnz]
        cap = int(nnz) + 16
    return None


def trunc_keep(indptr, cols, vals, max_elmts: int):
    """hypre-exact truncation keep-mask (qsort2_abs tie order); None if
    no compiled kernels."""
    dll = _load()
    if dll is None:
        return None
    import ctypes

    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    n = len(indptr) - 1
    keep = np.zeros(len(cols), dtype=np.uint8)
    dll.trunc_keep(
        _ptr(indptr), _ptr(cols),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n), ctypes.c_int64(max_elmts),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)


def _ilu_bind(lib, name, extra):
    import ctypes as _ct

    I64 = _ct.POINTER(_ct.c_int64)
    F64 = _ct.POINTER(_ct.c_double)
    PI = _ct.POINTER(I64)
    PF = _ct.POINTER(F64)
    fn = getattr(lib, name)
    fn.argtypes = [I64, I64, F64, _ct.c_int64] + extra + [PI, PI, PF, PI, PI, PF]
    fn.restype = _ct.c_int
    lib.ilu_free_ptr.argtypes = [_ct.c_void_p]
    lib.ilu_free_ptr.restype = None
    return fn


def _ilu_collect(lib, n, Lp, Li, Lx, Up, Ui, Ux):
    import ctypes as _ct

    def take(ptr, count, np_dt, ct):
        arr = np.ctypeslib.as_array(
            _ct.cast(ptr, _ct.POINTER(ct)), shape=(count,)
        ).copy()
        lib.ilu_free_ptr(ptr)
        return arr.astype(np_dt, copy=False)

    lp = take(Lp, n + 1, np.int64, _ct.c_int64)
    li = take(Li, int(lp[-1]), np.int64, _ct.c_int64)
    lx = take(Lx, int(lp[-1]), np.float64, _ct.c_double)
    up = take(Up, n + 1, np.int64, _ct.c_int64)
    ui = take(Ui, int(up[-1]), np.int64, _ct.c_int64)
    ux = take(Ux, int(up[-1]), np.float64, _ct.c_double)
    return (lp, li, lx), (up, ui, ux)


def iluk_factor(indptr, indices, data, n: int, fill: int):
    """Native ILU(k) level-of-fill factorization (Euclid's role).
    Returns ((Lp,Li,Lx),(Up,Ui,Ux)) with unit-diag L implicit, or None."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        return None
    fn = _ilu_bind(lib, "iluk_factor", [_ct.c_int])
    ip = np.ascontiguousarray(indptr, dtype=np.int64)
    ix = np.ascontiguousarray(indices, dtype=np.int64)
    dx = np.ascontiguousarray(data, dtype=np.float64)
    I64 = _ct.POINTER(_ct.c_int64)
    F64 = _ct.POINTER(_ct.c_double)
    outs = [I64(), I64(), F64(), I64(), I64(), F64()]
    fn(_ptr(ip), _ptr(ix), dx.ctypes.data_as(F64), n, int(fill),
       *[_ct.byref(o) for o in outs])
    return _ilu_collect(lib, n, *outs)


def ilut_factor(indptr, indices, data, n: int, droptol: float, maxrow: int):
    """Native dual-threshold ILUT (Saad; par_ilu_setup.c ILUT role)."""
    import ctypes as _ct

    lib = _load()
    if lib is None:
        return None
    fn = _ilu_bind(lib, "ilut_factor", [_ct.c_double, _ct.c_int64])
    ip = np.ascontiguousarray(indptr, dtype=np.int64)
    ix = np.ascontiguousarray(indices, dtype=np.int64)
    dx = np.ascontiguousarray(data, dtype=np.float64)
    I64 = _ct.POINTER(_ct.c_int64)
    F64 = _ct.POINTER(_ct.c_double)
    outs = [I64(), I64(), F64(), I64(), I64(), F64()]
    fn(_ptr(ip), _ptr(ix), dx.ctypes.data_as(F64), n, float(droptol),
       int(maxrow), *[_ct.byref(o) for o in outs])
    return _ilu_collect(lib, n, *outs)


# ----------------------------------------------------------------------
# Round-3 setup-speed kernels
# ----------------------------------------------------------------------
def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def strength_classical(A, theta: float, max_row_sum: float, sabs: bool = False):
    """Native strength pattern (par_strength.c role); returns a scipy
    pattern CSR (data ones) or None without a compiler."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "strength_bound"):
        I64 = ctypes.POINTER(ctypes.c_int64)
        D = ctypes.POINTER(ctypes.c_double)
        lib.strength_classical.argtypes = [
            I64, I64, D, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, I64, I64,
        ]
        lib.strength_classical.restype = ctypes.c_int64
        lib.strength_bound = True
    M = A.tocsr() if not hasattr(A, "to_scipy") else A.to_scipy()
    n = M.shape[0]
    import scipy.sparse as sp

    if (M.indices.dtype == np.int32 and M.indptr.dtype == np.int32
            and M.data.dtype == np.float64):
        # zero-conversion path on scipy's native int32 arrays
        if not hasattr(lib, "strength32_bound"):
            I32 = ctypes.POINTER(ctypes.c_int32)
            D = ctypes.POINTER(ctypes.c_double)
            lib.strength_classical_i32.argtypes = [
                I32, I32, D, ctypes.c_int64, ctypes.c_double,
                ctypes.c_double, ctypes.c_int, I32, I32,
            ]
            lib.strength_classical_i32.restype = ctypes.c_int64
            lib.strength32_bound = True
        ai = np.ascontiguousarray(M.indptr)
        aj = np.ascontiguousarray(M.indices)
        ad = np.ascontiguousarray(M.data)
        Sp = np.empty(n + 1, dtype=np.int32)
        Si = np.empty(max(M.nnz, 1), dtype=np.int32)
        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        nnz = lib.strength_classical_i32(
            i32p(ai), i32p(aj), _dptr(ad), n,
            ctypes.c_double(theta), ctypes.c_double(max_row_sum),
            ctypes.c_int(1 if sabs else 0), i32p(Sp), i32p(Si),
        )
        return sp.csr_matrix(
            (np.ones(int(nnz), dtype=np.float32), Si[:nnz], Sp),
            shape=(n, n),
        )

    ai = np.ascontiguousarray(M.indptr, dtype=np.int64)
    aj = np.ascontiguousarray(M.indices, dtype=np.int64)
    ad = np.ascontiguousarray(M.data, dtype=np.float64)
    Sp = np.zeros(n + 1, dtype=np.int64)
    Si = np.zeros(max(M.nnz, 1), dtype=np.int64)
    nnz = lib.strength_classical(
        _ptr(ai), _ptr(aj), _dptr(ad), n,
        ctypes.c_double(theta), ctypes.c_double(max_row_sum),
        ctypes.c_int(1 if sabs else 0), _ptr(Sp), _ptr(Si),
    )
    # int32 index arrays: scipy ops on mixed/int64 indices silently
    # upcast every downstream product (~2x slower SpGEMM)
    return sp.csr_matrix(
        (np.ones(int(nnz), dtype=np.float32),
         Si[:nnz].astype(np.int32), Sp.astype(np.int32)),
        shape=(n, n),
    )


def pmis_loop(S_indptr, S_indices, n: int, measure, cf, first_round_is: bool):
    """Native PMIS iterated IS; mutates cf/measure copies, returns cf or
    None without a compiler."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "pmis_bound"):
        I64 = ctypes.POINTER(ctypes.c_int64)
        D = ctypes.POINTER(ctypes.c_double)
        lib.pmis_loop.argtypes = [I64, I64, ctypes.c_int64, D, I64, ctypes.c_int]
        lib.pmis_loop.restype = None
        lib.pmis_bound = True
    sp_ = np.ascontiguousarray(S_indptr, dtype=np.int64)
    si_ = np.ascontiguousarray(S_indices, dtype=np.int64)
    meas = np.ascontiguousarray(measure, dtype=np.float64).copy()
    cfa = np.ascontiguousarray(cf, dtype=np.int64).copy()
    lib.pmis_loop(
        _ptr(sp_), _ptr(si_), n, _dptr(meas), _ptr(cfa),
        ctypes.c_int(1 if first_round_is else 0),
    )
    return cfa


def classical_interp_fill(A, S, cf, cmap):
    """Native modified-classical interpolation; returns scipy CSR P or
    None without a compiler."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "cinterp_bound"):
        I64 = ctypes.POINTER(ctypes.c_int64)
        D = ctypes.POINTER(ctypes.c_double)
        lib.classical_interp_fill.argtypes = [
            I64, I64, D, D, I64, I64, I64, I64, ctypes.c_int64, I64, I64, D,
        ]
        lib.classical_interp_fill.restype = ctypes.c_int64
        lib.cinterp_bound = True
    n = A.shape[0]
    ai = np.ascontiguousarray(A.indptr, dtype=np.int64)
    aj = np.ascontiguousarray(A.indices, dtype=np.int64)
    ad = np.ascontiguousarray(A.data, dtype=np.float64)
    diag = np.ascontiguousarray(A.diagonal(), dtype=np.float64)
    sp_ = np.ascontiguousarray(S.indptr, dtype=np.int64)
    si_ = np.ascontiguousarray(S.indices, dtype=np.int64)
    cfa = np.ascontiguousarray(cf, dtype=np.int64)
    cm = np.ascontiguousarray(cmap, dtype=np.int64)
    cap = int(S.nnz + n + 1)
    Pp = np.zeros(n + 1, dtype=np.int64)
    Pi = np.zeros(cap, dtype=np.int64)
    Px = np.zeros(cap, dtype=np.float64)
    nnz = lib.classical_interp_fill(
        _ptr(ai), _ptr(aj), _dptr(ad), _dptr(diag), _ptr(sp_), _ptr(si_),
        _ptr(cfa), _ptr(cm), n, _ptr(Pp), _ptr(Pi), _dptr(Px),
    )
    import scipy.sparse as sp

    nc = int((np.asarray(cf) > 0).sum())
    return sp.csr_matrix(
        (Px[:nnz], Pi[:nnz].astype(np.int32), Pp.astype(np.int32)),
        shape=(n, nc),
    )


def _bind_spgemm(lib):
    if hasattr(lib, "spgemm_bound"):
        return
    I64 = ctypes.POINTER(ctypes.c_int64)
    D = ctypes.POINTER(ctypes.c_double)
    PI = ctypes.POINTER(I64)
    PD = ctypes.POINTER(D)
    lib.csr_matmul.argtypes = [
        I64, I64, D, I64, I64, D,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, PI, PI, PD,
    ]
    lib.csr_matmul.restype = ctypes.c_int64
    lib.csr_transpose.argtypes = [
        I64, I64, D, ctypes.c_int64, ctypes.c_int64, I64, I64, D,
    ]
    lib.csr_transpose.restype = None
    lib.csr_sort_rows.argtypes = [I64, I64, D, ctypes.c_int64]
    lib.csr_sort_rows.restype = None
    lib.ilu_free_ptr.argtypes = [ctypes.c_void_p]
    lib.ilu_free_ptr.restype = None
    lib.spgemm_bound = True


def _as_c_csr(M):
    return (
        np.ascontiguousarray(M.indptr, dtype=np.int64),
        np.ascontiguousarray(M.indices, dtype=np.int64),
        np.ascontiguousarray(M.data, dtype=np.float64),
    )


def csr_matmul(A, B):
    """Native C = A @ B (sorted rows); returns scipy CSR or None."""
    lib = _load()
    if lib is None:
        return None
    _bind_spgemm(lib)
    import scipy.sparse as sp

    Ap, Ai, Ax = _as_c_csr(A)
    Bp, Bi, Bx = _as_c_csr(B)
    n, k = A.shape
    k2, m = B.shape
    I64 = ctypes.POINTER(ctypes.c_int64)
    D = ctypes.POINTER(ctypes.c_double)
    Cp = I64()
    Ci = I64()
    Cx = D()
    nnz = lib.csr_matmul(
        _ptr(Ap), _ptr(Ai), _dptr(Ax), _ptr(Bp), _ptr(Bi), _dptr(Bx),
        n, k, m, ctypes.byref(Cp), ctypes.byref(Ci), ctypes.byref(Cx),
    )
    indptr = np.ctypeslib.as_array(Cp, shape=(n + 1,)).copy()
    indices = np.ctypeslib.as_array(Ci, shape=(max(nnz, 1),))[:nnz].copy()
    data = np.ctypeslib.as_array(Cx, shape=(max(nnz, 1),))[:nnz].copy()
    lib.ilu_free_ptr(ctypes.cast(Cp, ctypes.c_void_p))
    lib.ilu_free_ptr(ctypes.cast(Ci, ctypes.c_void_p))
    lib.ilu_free_ptr(ctypes.cast(Cx, ctypes.c_void_p))
    ip = np.ascontiguousarray(indptr, dtype=np.int64)
    lib.csr_sort_rows(_ptr(ip), _ptr(indices), _dptr(data), n)
    out = sp.csr_matrix((data, indices, indptr), shape=(n, m))
    # scipy's @ prunes exact-zero cancellations; match it so the two
    # SpGEMMs are drop-in interchangeable (pattern-identical hierarchies)
    out.eliminate_zeros()
    return out


def csr_transpose(A):
    """Native CSR transpose (sorted rows); returns scipy CSR or None."""
    lib = _load()
    if lib is None:
        return None
    _bind_spgemm(lib)
    import scipy.sparse as sp

    Ap, Ai, Ax = _as_c_csr(A)
    n, m = A.shape
    Tp = np.zeros(m + 1, dtype=np.int64)
    Ti = np.zeros(max(A.nnz, 1), dtype=np.int64)
    Tx = np.zeros(max(A.nnz, 1), dtype=np.float64)
    lib.csr_transpose(_ptr(Ap), _ptr(Ai), _dptr(Ax), n, m, _ptr(Tp), _ptr(Ti), _dptr(Tx))
    return sp.csr_matrix((Tx[: A.nnz], Ti[: A.nnz], Tp), shape=(m, n))


def galerkin_rap_native(A, P):
    """P^T (A P) with native SpGEMM; None without a compiler."""
    PT = csr_transpose(P)
    if PT is None:
        return None
    AP = csr_matmul(A, P)
    if AP is None:
        return None
    return csr_matmul(PT, AP)


def nongalerkin_filter_native(A, tol: float, lump: str = "diag"):
    """Native sparsification (par_nongalerkin.c role); scipy CSR or None."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "ngf_bound"):
        I64 = ctypes.POINTER(ctypes.c_int64)
        D = ctypes.POINTER(ctypes.c_double)
        lib.nongalerkin_filter_c.argtypes = [
            I64, I64, D, ctypes.c_int64, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(I64), ctypes.POINTER(I64), ctypes.POINTER(D),
        ]
        lib.nongalerkin_filter_c.restype = ctypes.c_int64
        lib.ilu_free_ptr.argtypes = [ctypes.c_void_p]
        lib.ilu_free_ptr.restype = None
        lib.ngf_bound = True
    import scipy.sparse as sp

    n = A.shape[0]
    M = A.tocsr() if not sp.issparse(A) or A.format != "csr" else A
    if (M.indices.dtype == np.int32 and M.indptr.dtype == np.int32
            and M.data.dtype == np.float64 and M.has_sorted_indices):
        # zero-copy two-pass path on scipy's native arrays
        if not hasattr(lib, "ngf32_bound"):
            I64 = ctypes.POINTER(ctypes.c_int64)
            I32 = ctypes.POINTER(ctypes.c_int32)
            D = ctypes.POINTER(ctypes.c_double)
            U8 = ctypes.POINTER(ctypes.c_uint8)
            lib.nongalerkin_count_i32.argtypes = [
                I32, I32, D, ctypes.c_int64, ctypes.c_double, U8, I64]
            lib.nongalerkin_count_i32.restype = ctypes.c_int64
            lib.nongalerkin_fill_i32.argtypes = [
                I32, I32, D, ctypes.c_int64, ctypes.c_int, U8, I64, I32, D]
            lib.nongalerkin_fill_i32.restype = None
            lib.ngf32_bound = True
        ip = np.ascontiguousarray(M.indptr)
        ix = np.ascontiguousarray(M.indices)
        ax = np.ascontiguousarray(M.data)
        keep2 = np.empty(max(M.nnz, 1), dtype=np.uint8)
        Cp = np.empty(n + 1, dtype=np.int64)
        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        nnz = lib.nongalerkin_count_i32(
            i32p(ip), i32p(ix), _dptr(ax), n, ctypes.c_double(tol),
            u8p(keep2), _ptr(Cp))
        Ci = np.empty(max(nnz, 1), dtype=np.int32)
        Cx = np.empty(max(nnz, 1), dtype=np.float64)
        lib.nongalerkin_fill_i32(
            i32p(ip), i32p(ix), _dptr(ax), n,
            ctypes.c_int(1 if lump == "strong" else 0),
            u8p(keep2), _ptr(Cp), i32p(Ci), _dptr(Cx))
        out = sp.csr_matrix(
            (Cx[:nnz], Ci[:nnz], Cp.astype(np.int32)), shape=A.shape)
    else:
        Ap, Ai, Ax = _as_c_csr(A)
        I64 = ctypes.POINTER(ctypes.c_int64)
        D = ctypes.POINTER(ctypes.c_double)
        Cp = I64(); Ci = I64(); Cx = D()
        nnz = lib.nongalerkin_filter_c(
            _ptr(Ap), _ptr(Ai), _dptr(Ax), n, ctypes.c_double(tol),
            ctypes.c_int(1 if lump == "strong" else 0),
            ctypes.byref(Cp), ctypes.byref(Ci), ctypes.byref(Cx),
        )
        indptr = np.ctypeslib.as_array(Cp, shape=(n + 1,)).copy()
        indices = np.ctypeslib.as_array(Ci, shape=(max(nnz, 1),))[:nnz].copy()
        data = np.ctypeslib.as_array(Cx, shape=(max(nnz, 1),))[:nnz].copy()
        lib.ilu_free_ptr(ctypes.cast(Cp, ctypes.c_void_p))
        lib.ilu_free_ptr(ctypes.cast(Ci, ctypes.c_void_p))
        lib.ilu_free_ptr(ctypes.cast(Cx, ctypes.c_void_p))
        out = sp.csr_matrix(
            (data, indices.astype(np.int32), indptr.astype(np.int32)),
            shape=A.shape,
        )
    # the numpy path's final `out + sp.diags(...)` canonicalizes and
    # prunes exact zeros (e.g. a fully-lumped row cancelling its own
    # diagonal); match it
    out.eliminate_zeros()
    return out


def dia_convert(indptr, indices, data, n: int, m: int, width_of, dtype):
    """Native CSR->DIA conversion (see kernels.c dia_offsets/dia_fill).

    width_of: callable (uniq offsets)->stored width (Pallas padding
    policy lives with the caller).  Returns (uniq offsets int64, data
    [noff, width] in `dtype`) or None without a compiler.  bfloat16 is
    filled as f32 then converted in one vectorized pass.
    """
    lib = _load()
    if lib is None:
        return None
    _bind_dia(lib)
    ad = np.ascontiguousarray(data, dtype=np.float64)
    mark = np.zeros(n + m - 1, dtype=np.uint8)
    uniq = np.zeros(n + m - 1, dtype=np.int64)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    i32 = (np.asarray(indptr).dtype == np.int32
           and np.asarray(indices).dtype == np.int32)
    if i32:
        ai = np.ascontiguousarray(indptr)
        aj = np.ascontiguousarray(indices)
        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        noff = lib.dia_offsets_i32(i32p(ai), i32p(aj), n, m, u8p(mark),
                                   _ptr(uniq))
    else:
        ai = np.ascontiguousarray(indptr, dtype=np.int64)
        aj = np.ascontiguousarray(indices, dtype=np.int64)
        noff = lib.dia_offsets(_ptr(ai), _ptr(aj), n, m, u8p(mark),
                               _ptr(uniq))
    uniq = uniq[:noff].copy()
    width = int(width_of(uniq))
    dt = np.dtype(dtype)
    bf16 = dt.name == "bfloat16"
    if i32 and bf16:
        # direct bf16 fill: double->float->bf16 RNE in C, bitwise equal
        # to the fill-f32 + astype(bf16) chain it replaces
        out = np.zeros((noff, width), dtype=dt)
        lib.dia_fill_i32_bf16(
            i32p(ai), i32p(aj), _dptr(ad), n, m, _ptr(uniq), noff, width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        return uniq, out
    if i32:
        fill_dt = np.float64 if dt == np.float64 else np.float32
        out = np.zeros((noff, width), dtype=fill_dt)
        fill = (lib.dia_fill_i32_f64 if fill_dt == np.float64
                else lib.dia_fill_i32_f32)
        fill(i32p(ai), i32p(aj), _dptr(ad), n, m, _ptr(uniq), noff, width,
             out.ctypes.data_as(ctypes.POINTER(
                 ctypes.c_double if fill_dt == np.float64
                 else ctypes.c_float)))
        if dt != fill_dt:
            out = out.astype(dt)
        return uniq, out
    fill_dt = np.float64 if dt == np.float64 else np.float32
    out = np.zeros((noff, width), dtype=fill_dt)
    fill = lib.dia_fill_f64 if fill_dt == np.float64 else lib.dia_fill_f32
    fill(_ptr(ai), _ptr(aj), _dptr(ad), n, m, _ptr(uniq), noff, width,
         out.ctypes.data_as(ctypes.POINTER(
             ctypes.c_double if fill_dt == np.float64 else ctypes.c_float)))
    if dt != fill_dt:
        out = out.astype(dt)
    return uniq, out


def _bind_dia(lib):
    if hasattr(lib, "dia_bound"):
        return
    I64 = ctypes.POINTER(ctypes.c_int64)
    I32 = ctypes.POINTER(ctypes.c_int32)
    D = ctypes.POINTER(ctypes.c_double)
    F = ctypes.POINTER(ctypes.c_float)
    U16 = ctypes.POINTER(ctypes.c_uint16)
    U8 = ctypes.POINTER(ctypes.c_uint8)
    lib.dia_offsets.argtypes = [I64, I64, ctypes.c_int64,
                                ctypes.c_int64, U8, I64]
    lib.dia_offsets.restype = ctypes.c_int64
    lib.dia_offsets_i32.argtypes = [I32, I32, ctypes.c_int64,
                                    ctypes.c_int64, U8, I64]
    lib.dia_offsets_i32.restype = ctypes.c_int64
    lib.dia_fill_f64.argtypes = [I64, I64, D, ctypes.c_int64,
                                 ctypes.c_int64, I64, ctypes.c_int64,
                                 ctypes.c_int64, D]
    lib.dia_fill_f64.restype = None
    lib.dia_fill_f32.argtypes = [I64, I64, D, ctypes.c_int64,
                                 ctypes.c_int64, I64, ctypes.c_int64,
                                 ctypes.c_int64, F]
    lib.dia_fill_f32.restype = None
    for fn, P in ((lib.dia_fill_i32_f64, D), (lib.dia_fill_i32_f32, F),
                  (lib.dia_fill_i32_bf16, U16)):
        fn.argtypes = [I32, I32, D, ctypes.c_int64, ctypes.c_int64,
                       I64, ctypes.c_int64, ctypes.c_int64, P]
        fn.restype = None
    lib.coo_dia_fill_bf16.argtypes = [I64, I64, D, ctypes.c_int64,
                                      ctypes.c_int64, I64, ctypes.c_int64,
                                      ctypes.c_int64, U16]
    lib.coo_dia_fill_bf16.restype = None
    lib.dia_bound = True


def dia_offsets_only(indptr, indices, n: int, m: int):
    """Distinct diagonal offsets of a CSR pattern (native); None without
    a compiler."""
    lib = _load()
    if lib is None:
        return None
    _bind_dia(lib)
    mark = np.zeros(n + m - 1, dtype=np.uint8)
    uniq = np.zeros(n + m - 1, dtype=np.int64)
    u8p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if (np.asarray(indptr).dtype == np.int32
            and np.asarray(indices).dtype == np.int32):
        ai = np.ascontiguousarray(indptr)
        aj = np.ascontiguousarray(indices)
        i32p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        noff = lib.dia_offsets_i32(i32p(ai), i32p(aj), n, m, u8p(mark),
                                   _ptr(uniq))
    else:
        ai = np.ascontiguousarray(indptr, dtype=np.int64)
        aj = np.ascontiguousarray(indices, dtype=np.int64)
        noff = lib.dia_offsets(_ptr(ai), _ptr(aj), n, m, u8p(mark),
                               _ptr(uniq))
    return uniq[:noff].copy()


def coo_dia_convert(rows, cols, vals, n: int, width_of, dtype,
                    counts: bool = False):
    """Embedded-COO -> DIA (see kernels.c coo_dia_*).  rows/cols are
    positions on an n-point lattice; offsets are cols-rows.  Returns
    (uniq, data[, cnt]) or None without a compiler."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "coo_dia_bound"):
        I64 = ctypes.POINTER(ctypes.c_int64)
        D = ctypes.POINTER(ctypes.c_double)
        F = ctypes.POINTER(ctypes.c_float)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        lib.coo_dia_offsets.argtypes = [I64, I64, ctypes.c_int64,
                                        ctypes.c_int64, U8, I64, I64]
        lib.coo_dia_offsets.restype = ctypes.c_int64
        for fn, P in ((lib.coo_dia_fill_f32, F), (lib.coo_dia_fill_f64, D)):
            fn.argtypes = [I64, I64, D, ctypes.c_int64, ctypes.c_int64,
                           I64, ctypes.c_int64, ctypes.c_int64, P]
            fn.restype = None
        lib.coo_dia_bound = True
    r = np.ascontiguousarray(rows, dtype=np.int64)
    c = np.ascontiguousarray(cols, dtype=np.int64)
    v = np.ascontiguousarray(vals, dtype=np.float64)
    nnz = len(v)
    mark = np.zeros(max(2 * n - 1, 1), dtype=np.uint8)
    uniq = np.zeros(max(2 * n - 1, 1), dtype=np.int64)
    cnt = np.zeros(max(2 * n - 1, 1), dtype=np.int64)
    noff = lib.coo_dia_offsets(
        _ptr(r), _ptr(c), nnz, n,
        mark.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr(uniq), _ptr(cnt))
    uniq = uniq[:noff].copy()
    cnt = cnt[:noff].copy()
    width = int(width_of(uniq))
    dt = np.dtype(dtype)
    if dt.name == "bfloat16":
        _bind_dia(lib)
        out = np.zeros((noff, width), dtype=dt)
        lib.coo_dia_fill_bf16(
            _ptr(r), _ptr(c), _dptr(v), nnz, n, _ptr(uniq), noff, width,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
        return (uniq, out, cnt) if counts else (uniq, out)
    fill_dt = np.float64 if dt == np.float64 else np.float32
    out = np.zeros((noff, width), dtype=fill_dt)
    fill = lib.coo_dia_fill_f64 if fill_dt == np.float64 else lib.coo_dia_fill_f32
    fill(_ptr(r), _ptr(c), _dptr(v), nnz, n, _ptr(uniq), noff, width,
         out.ctypes.data_as(ctypes.POINTER(
             ctypes.c_double if fill_dt == np.float64 else ctypes.c_float)))
    if dt != fill_dt:
        out = out.astype(dt)
    return (uniq, out, cnt) if counts else (uniq, out)


def coo_dia_counts(rows, cols, n: int):
    """(uniq offsets, per-offset entry counts) for an embedded COO;
    None without a compiler."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "coo_dia_bound"):
        # bind via the full converter once
        coo_dia_convert(np.zeros(0, np.int64), np.zeros(0, np.int64),
                        np.zeros(0), 1, lambda u: 1, np.float64)
    r = np.ascontiguousarray(rows, dtype=np.int64)
    c = np.ascontiguousarray(cols, dtype=np.int64)
    mark = np.zeros(max(2 * n - 1, 1), dtype=np.uint8)
    uniq = np.zeros(max(2 * n - 1, 1), dtype=np.int64)
    cnt = np.zeros(max(2 * n - 1, 1), dtype=np.int64)
    noff = lib.coo_dia_offsets(
        _ptr(r), _ptr(c), len(r), n,
        mark.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr(uniq), _ptr(cnt))
    return uniq[:noff].copy(), cnt[:noff].copy()


def embedded_counts(mrow, mcol, rpos, cpos, n: int):
    """(uniq embedded offsets, per-offset counts) for off = cpos[col] -
    rpos[row]; None without a compiler.  Accepts int32 or int64
    row/col without copying."""
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "emb_bound"):
        I64 = ctypes.POINTER(ctypes.c_int64)
        I32 = ctypes.POINTER(ctypes.c_int32)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        lib.embedded_offsets_i32.argtypes = [I32, I32, ctypes.c_int64,
                                             I64, I64, ctypes.c_int64,
                                             U8, I64, I64]
        lib.embedded_offsets_i32.restype = ctypes.c_int64
        lib.embedded_offsets_i64.argtypes = [I64, I64, ctypes.c_int64,
                                             I64, I64, ctypes.c_int64,
                                             U8, I64, I64]
        lib.embedded_offsets_i64.restype = ctypes.c_int64
        lib.emb_bound = True
    mrow = np.asarray(mrow)
    mcol = np.asarray(mcol)
    if mrow.dtype == np.int32 and mcol.dtype == np.int32:
        fn = lib.embedded_offsets_i32
        r = np.ascontiguousarray(mrow)
        c = np.ascontiguousarray(mcol)
        rp = r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        cp = c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    else:
        fn = lib.embedded_offsets_i64
        r = np.ascontiguousarray(mrow, dtype=np.int64)
        c = np.ascontiguousarray(mcol, dtype=np.int64)
        rp = _ptr(r)
        cp = _ptr(c)
    rpos_a = np.ascontiguousarray(rpos, dtype=np.int64)
    cpos_a = np.ascontiguousarray(cpos, dtype=np.int64)
    mark = np.zeros(max(2 * n - 1, 1), dtype=np.uint8)
    uniq = np.zeros(max(2 * n - 1, 1), dtype=np.int64)
    cnt = np.zeros(max(2 * n - 1, 1), dtype=np.int64)
    noff = fn(rp, cp, len(r), _ptr(rpos_a), _ptr(cpos_a), n,
              mark.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
              _ptr(uniq), _ptr(cnt))
    return uniq[:noff].copy(), cnt[:noff].copy()
