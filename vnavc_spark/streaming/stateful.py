"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.9 extension — the reference has no streaming at all).

``running_user_totals``: per-key running aggregates that survive
micro-batches AND query restarts (state store checkpointing) — the
pattern for any incremental per-book/per-speaker accumulator the
batch pipeline recomputes from scratch (download progress, corpus
hours so far, per-narrator utterance counts).

State shape: one tiny row per key — O(keys), bounded; no raw events
retained. Output mode "update": one row per key per micro-batch that
touched it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_cents bigint"
STATE_SCHEMA = "n bigint, cents bigint"


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # integer cents: exact accumulation in any arrival order
        cents += int((pdf["value"] * 100).round().sum())
    state.update((n, cents))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_cents": cents}]
    )


def running_user_totals(
    events: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Streaming per-user running (count, total) with checkpointed
    state. ``NoTimeout``: state lives until explicitly dropped —
    right for entity accumulators; use event-time timeouts for
    session-style state."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
