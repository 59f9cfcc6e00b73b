"""Idempotent persist — the WARN-free cache entry point.

``DataFrame.persist()`` on a plan the CacheManager already holds logs
``WARN CacheManager: Asked to cache already cached data`` and does
nothing. Every bench run samples a query 3-5 times in one session and
the driver's 50-query window re-invokes shared helpers (the IVF
prologue, q108's edge build), so those WARNs repeated until they buried
real cache anomalies (VERDICT r8 #5). ``persist_once`` consults the
CacheManager first (``df.storageLevel`` is a plan-keyed lookup, not an
object attribute), so a second invocation silently reuses the existing
entry.

Used via ``.transform(persist_once)`` to keep chained builder syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persist_once(df: DataFrame) -> DataFrame:
    """persist() only if this plan isn't already cached; returns df.

    Callers that need the cache POPULATED before fan-out (the q182
    unmaterialized-cache race) still follow with ``.count()`` — a
    count against an already-populated entry is a cheap cache scan,
    and skipping it would reintroduce the race when a sibling call
    site persisted the same plan without counting.

    The check-then-persist is advisory, not atomic: two threads
    building the same plan concurrently can both see it uncached and
    both persist (second one WARNs, results stay correct). All current
    callers run queries serially."""
    lvl = df.storageLevel
    if not (lvl.useMemory or lvl.useDisk):
        df.persist()
    return df


def persist_scoped(df: DataFrame) -> tuple[DataFrame, bool]:
    """Like :func:`persist_once`, but returns ``(df, owned)`` where
    ``owned`` is True only if THIS call created the cache entry.

    For call sites that unpersist when done (ADVICE r9 #2): an
    unconditional ``unpersist()`` after ``persist_once`` can evict a
    cache entry some OTHER owner created for an equivalent plan (the
    CacheManager is plan-keyed, not handle-keyed). Such sites must
    skip the unpersist when ``owned`` is False — the entry wasn't
    theirs to release. Same advisory (non-atomic) caveat as
    ``persist_once``; all current callers run serially."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return df, False
    df.persist()
    return df, True


def persist_materialized(df: DataFrame) -> DataFrame:
    """``persist_once`` + the materializing ``count()``, skipping the
    count when an equivalent plan is ALREADY cached (r13).

    Every fan-out cache creator routes through a helper like this and
    counts when it creates the entry, so a plan found already cached
    is already materialized — re-counting it scans the whole cached
    relation again on EVERY bench sample / repeated build (measured
    0.15-0.4 s per warm build on d44/s67/s57-class operators) for no
    effect. If a racing/unfilled entry ever slipped through, the cost
    is a deterministic lineage recompute on first action — never a
    wrong result (the cache is a recompute-avoidance layer only).
    """
    lvl = df.storageLevel
    if not (lvl.useMemory or lvl.useDisk):
        df.persist()
        df.count()
    return df
