"""Session-scoped tracked persists for small derived aggregates.

Several operators build a SMALL intermediate (a count-min sketch's
bucket cells, a vocabulary count table, per-doc shingle sets) that
feeds multiple consumers in the same plan. Without a persist, every
consumer replays the full lineage — a 2-scan job becomes a 10-scan
job (measured on q116/q118/q119 plans; at 100 TB that is the whole
cost). Persisting fixes the scan count, but a bare ``.persist()``
leaks: repeated calls in one session (bench loops, test modules)
accumulate cached partitions until executor storage eviction kicks
in (ADVICE r03 on the text stage).

``tracked_persist(df, slot)`` keeps AT MOST ONE live cache per slot:
the next call for the same slot unpersists the previous DataFrame
first. Callers that finish early can unpersist manually; everyone
else is bounded by construction.

Single-flight-per-slot is a SEQUENTIAL contract: materialize (or
abandon) a slot's DataFrame before the next call on the same slot —
a second concurrent caller evicts the first mid-query, which is
always CORRECT (unpersist only drops the cache; lineage recomputes)
but silently reinstates the re-scan cost the cache exists to
prevent. The swap itself is lock-protected so concurrent callers
can't double-unpersist or leak an entry.
"""

from __future__ import annotations

import threading

from py4j.protocol import Py4JError
from pyspark.errors import PySparkException
from pyspark.sql import DataFrame

# what a reuse probe against a stale/stopped session legitimately
# raises: JVM-bridge errors (py4j), captured Spark-side exceptions,
# and the socket-level failures of a dead gateway
_REUSE_PROBE_EXPECTED = (Py4JError, PySparkException, ConnectionError)

_SLOTS: dict[str, list] = {}
_LOCK = threading.Lock()

# count of reuse probes that fell through on an EXPECTED stale-session
# / JVM-bridge error (observability: a probe that never succeeds and
# always lands here means plan reuse is silently dead — round-5
# advice; unexpected exception types now propagate instead of hiding)
REUSE_PROBE_FAILURES = 0


def clear_tracked() -> None:
    """Unpersist every tracked slot and empty the registry — session
    hygiene for consumers that need per-query isolation (the plan
    audit: a warm cache REWRITES later queries' explain output, with
    InMemoryTableScan either hiding a window subtree or reprinting
    it once per consumer, so plan facts measured in a shared session
    depend on execution history)."""
    with _LOCK:
        evicted = [df for slot in _SLOTS.values() for df in slot]
        _SLOTS.clear()
    for old in evicted:
        try:
            old.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def tracked_persist(
    df: DataFrame, slot: str, reuse_same_plan: bool = False
) -> DataFrame:
    """``reuse_same_plan`` is OPT-IN and only safe when the slot's
    inputs are immutable for the session: plan equality is judged on
    the ANALYZED plan (paths, not file contents), so a slot over a
    path that gets REWRITTEN between calls (e.g. the incremental
    dedup signature table after compaction) would serve stale cached
    data. Leave it off for anything that stages/rewrites."""
    from pyspark import StorageLevel

    with _LOCK:
        prev = _SLOTS.setdefault(slot, [])
        if reuse_same_plan and prev:
            # plan-aware reuse: queries built from a SHARED helper
            # (e.g. q124/q131's capped-basket items) produce the same
            # analyzed plan — evicting and re-persisting would throw
            # away a warm cache only to rebuild the identical one
            # (measured: +1.6 s on q131 when it follows q124).
            # sameResult is Catalyst's own plan-equivalence check.
            old = prev[0]
            try:
                # sameResult is a pure canonicalized-plan comparison
                # — it succeeds even for a DataFrame from a STOPPED
                # session (identical paths analyze identically), so
                # reuse additionally requires the SAME live session
                # object or the caller gets a dead-context DataFrame
                if old.sparkSession is df.sparkSession and (
                    old._jdf.queryExecution()
                    .analyzed()
                    .sameResult(df._jdf.queryExecution().analyzed())
                ):
                    return old
            except _REUSE_PROBE_EXPECTED:
                # stale/stopped session or JVM bridge failure — fall
                # through to the normal swap. Counted, not swallowed
                # blind: a bare `except Exception` here made a genuine
                # py4j error indistinguishable from the intended
                # stale-session case, so reuse could silently never
                # trigger (round-5 advice). Anything else propagates.
                global REUSE_PROBE_FAILURES
                REUSE_PROBE_FAILURES += 1
        evicted = list(prev)
        prev.clear()
        prev.append(df)
    for old in evicted:
        try:
            old.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    return df.persist(StorageLevel.MEMORY_AND_DISK)
