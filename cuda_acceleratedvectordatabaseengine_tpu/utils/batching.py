"""Static-shape batch bucketing.

Everything under ``jit`` compiles once per shape; recompiling inside a 2 ms
coalescing window (the reference's batcher window, ``server/query_service.h:
26-28``) would blow the p99 budget. Incoming batches are therefore padded up
to a small set of power-of-two buckets and executables are warmed per bucket
(SURVEY.md §7 hard part #3).
"""

from __future__ import annotations

BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)


def bucket_size(n: int, buckets: tuple[int, ...] = BUCKETS) -> int:
    """Smallest bucket ≥ n (or round up to a multiple of the largest)."""
    if n <= 0:
        return buckets[0]
    for b in buckets:
        if n <= b:
            return b
    top = buckets[-1]
    return ((n + top - 1) // top) * top
