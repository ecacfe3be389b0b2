"""Tracked persist/unpersist for multi-stage operators.

Operators like ``near_dup_pairs`` / ``srp_near_dup`` persist intermediates
(membership, signatures, verified representative pairs) that are consumed by
more than one downstream branch of the SAME returned plan.  The functions are
lazy — no action runs inside them — so they cannot unpersist before
returning without forfeiting the reuse.  Instead every persist is registered
here and the caller (bench harness, oracle checker, or a long-lived session)
calls :func:`release` after its final action on the returned frame.

Without this, repeated calls in a long-lived session accumulate cached
partitions until the storage-memory LRU starts evicting — not a correctness
bug, but cache pressure that penalizes unrelated queries (ADVICE r1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() a frame and register it for a later :func:`release`."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def release(blocking: bool = False) -> int:
    """Unpersist every tracked frame.  Returns the count.

    ``blocking=True`` waits for the block eviction to complete — the
    bench harness uses it between queries so that an asynchronous
    eviction (and its GC tail) cannot overlap the NEXT query's timed
    window (ADVICE r12).  Default stays non-blocking for long-lived
    sessions where latency matters more than isolation."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking=blocking)
    return n
