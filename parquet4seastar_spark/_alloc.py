"""Process-level allocator tuning for numpy-heavy codec kernels.

glibc malloc serves allocations above MMAP_THRESHOLD (128 KiB default) with
fresh mmap regions and returns them to the kernel on free.  Every multi-MB
numpy temporary then pays page-fault + zeroing cost: on this class of host a
single masked-copy pass over 75 MB measured ~640 ms cold vs ~44 ms with heap
reuse -- a 14x penalty on every vectorized pass.

Raising M_MMAP_THRESHOLD keeps large blocks on the heap so freed temporaries
are reused.  Safe to call multiple times; silently does nothing on non-glibc
platforms.  Imported for its side effect by parquet4seastar_spark and by the
Spark worker entry points (each Python worker is a fresh process).
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_TOP_PAD = -2
_M_MMAP_THRESHOLD = -3

_applied = False


def tune_allocator() -> bool:
    global _applied
    if _applied:
        return True
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)  # big blocks on the heap
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)  # don't give them back on free
        libc.mallopt(_M_TOP_PAD, 1 << 26)
        _applied = True
    except OSError:
        return False
    return True


tune_allocator()
