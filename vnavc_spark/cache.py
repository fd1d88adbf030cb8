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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[str, list] = {}


def tracked_persist(df: DataFrame, slot: str) -> DataFrame:
    from pyspark import StorageLevel

    prev = _SLOTS.setdefault(slot, [])
    while prev:
        old = prev.pop()
        try:
            old.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    prev.append(df)
    return df.persist(StorageLevel.MEMORY_AND_DISK)
