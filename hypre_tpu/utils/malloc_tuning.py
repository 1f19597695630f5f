"""Host allocator tuning for fault-expensive environments.

AMG setup is a pipeline of large short-lived numpy/scipy buffers
(strength masks, SpGEMM temps, DIA staging).  glibc serves >128KB
allocations with fresh mmap regions and returns them on free, so every
pipeline stage pays first-touch page faults for its whole working set.
On bare metal that's ~10 GB/s and invisible; under lazy-memory
hypervisors (e.g. firecracker-style VMs, where a cold anonymous 4k
fault can cost ~20-50 MB/s) it dominates the entire setup phase —
measured 14-19 s for one 96^3 matrix build cold vs 0.3-0.6 s with a
warm reused heap.

`tune_host_malloc()` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD so
large buffers live on the brk heap and freed pages stay mapped: each
setup stage then reuses the previous stage's already-faulted pages and
only the peak working set ever pays cold faults.  This is the same
class of fix as the reference's umalloc/memory-pool layer
(ref utilities/umalloc.c, utilities/memory.c hypre_MAlloc) — keep hot
host memory owned and reused instead of returning it to the OS.

No-op off glibc/Linux.  Disable with HYPRE_TPU_MALLOC_TUNE=0.
"""
from __future__ import annotations

import ctypes
import os

_done = False

# glibc mallopt parameter numbers (bits/mman.h values are stable ABI)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_host_malloc(threshold: int = 1 << 30) -> bool:
    """Keep allocations below `threshold` on the (reused, warm) heap.
    Returns True if applied.  Idempotent."""
    global _done
    if _done:
        return True
    if os.environ.get("HYPRE_TPU_MALLOC_TUNE", "1") == "0":
        return False
    try:
        libc = ctypes.CDLL(None, use_errno=True)
        ok1 = libc.mallopt(_M_MMAP_THRESHOLD, ctypes.c_int(threshold))
        ok2 = libc.mallopt(_M_TRIM_THRESHOLD, ctypes.c_int(threshold))
        _done = bool(ok1) and bool(ok2)
        return _done
    except (OSError, AttributeError):  # musl/macOS: no mallopt
        return False
