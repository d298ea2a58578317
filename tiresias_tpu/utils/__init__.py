"""Host utilities: audio I/O, hashing, logging, tracing, native bindings."""

from __future__ import annotations


def next_pow2(n: int, cap: int | None = None) -> int:
    """Smallest power of two >= max(n, 1), optionally capped.

    The shared bucketing rule for everything that pads a dynamic count to
    a bounded set of XLA compile shapes: ingest batch sizes, device-view
    append deltas, serve batch padding, and the serve warmup shapes (which
    must stay consistent with the scorer's padding by construction).
    """
    b = 1
    while b < n and (cap is None or b < cap):
        b *= 2
    return b
