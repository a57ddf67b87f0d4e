"""Heap-retention for long-lived serving actors (glibc mallopt).

A serving actor (kNN shard, render shard, overlay bank) allocates the same few-MB
scratch buffers every call. Default glibc behavior returns that memory to the OS
between calls (heap trim at 128 KB, mmap for blocks >= the dynamic threshold), so
every call re-faults its working set — fresh-page faults are the dominant per-call
cost on memory-overcommitted hosts (see BASELINE.md "Host-degradation caveat"), and
on any host they beat allocator reuse. ``retain_heap()`` pins the actor's heap at
its high-water mark: no trims, no mmap'd big blocks — the steady-state working set
stays resident and reused. Bounded by the actor's true peak (few hundred MB for the
kNN shards); call it only from actors whose scratch is steady-state, never from
short-lived tasks.
"""

from __future__ import annotations

# glibc mallopt parameter numbers (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4


def retain_heap() -> bool:
    """Best-effort: returns True when the glibc knobs were applied."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = libc.mallopt(_M_TRIM_THRESHOLD, ctypes.c_int(2**31 - 1))
        ok &= libc.mallopt(_M_MMAP_MAX, 0)
        return bool(ok)
    except Exception:
        return False
