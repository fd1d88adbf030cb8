"""Join operators (SURVEY.md §2.3, J1-J6).

Scale notes: every join here is a key equi-join, so Catalyst is free
to pick broadcast-hash (small dims: narrators/nation/region — we hint
with ``broadcast()``), shuffled-hash, or sort-merge; AQE converts to
broadcast at runtime when a side turns out small and splits skewed
partitions (20-hour books vs 2-hour books).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vnavc_spark.functions.text import file_stem


def stem_pairing(
    audio: DataFrame,
    text: DataFrame,
    audio_path: str = "audio_path",
    text_path: str = "text_path",
) -> DataFrame:
    """J1: pair audio↔text files on filename stem — the reference's
    hand-rolled sorted two-pointer merge join
    (``aeneas_batch_align.py:652-671``, duplicated at
    ``mfa_batch_align.py:93-110``) becomes a plain inner equi-join;
    Spark picks the physical strategy (unmatched rows drop, same
    semantics)."""
    a = audio.withColumn("stem", file_stem(audio_path))
    t = text.withColumn("stem", file_stem(text_path))
    return a.join(t, on="stem", how="inner")


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str | Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """J3: metadata upsert — for each update row, overwrite the
    matching base row's columns where the update is non-null, else
    append as a new row (reference's per-result CSV merge loop,
    ``process_all.py:797-839``).

    Implemented as one full-outer join + per-column ``coalesce(new,
    old)`` — a single shuffle instead of the reference's O(n) row
    loop; with Delta/Iceberg in production this is ``MERGE INTO``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if update_cols is None:
        update_cols = [c for c in updates.columns if c not in keys]
    missing_in_base = [c for c in update_cols if c not in base.columns]
    u = updates.select(*keys, *update_cols)
    joined = base.alias("b").join(u.alias("u"), on=keys, how="full_outer")
    out_cols = []
    for c in base.columns:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in update_cols:
            out_cols.append(F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"b.{c}").alias(c))
    for c in missing_in_base:
        out_cols.append(F.col(f"u.{c}").alias(c))
    return joined.select(*out_cols)


def books_with_narrator(
    books: DataFrame,
    narrators: DataFrame,
    narrator_array: str = "narrator",
    roster_key: str = "narrator_id",
) -> DataFrame:
    """J5: book ↔ narrator reference join. The reference keys output
    directories on the *first* narrator id of a possibly-multi
    narrator list (``aeneas_batch_align.py:198-213``); we keep the
    full array and left-join the roster on the first element.
    Narrator roster is a few-hundred-row dimension → broadcast."""
    # try_element_at: NULL for empty arrays (ANSI-safe)
    first_id = F.try_element_at(F.col(narrator_array), F.lit(1)).getField("id")
    return books.withColumn("first_narrator_id", first_id).join(
        F.broadcast(narrators),
        on=F.col("first_narrator_id") == narrators[roster_key],
        how="left",
    )


def lookup(
    facts: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J2/J4/J6 generic: hydrate rows from a dimension table
    (book↔JSON metadata ``aeneas_batch_align.py:187-196``; wav↔txt
    ``push_to_hf.py:115-122``). Positional zips in the reference
    (``crawler/metadata.py:192-195``) are avoided by design: both
    URLs ride in one row from the start."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=on, how=how)
