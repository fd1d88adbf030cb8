"""Aggregation operators (SURVEY.md §2.4, G1-G11).

Everything is a declarative groupBy/agg so Spark does map-side
partial aggregation automatically — at 100 TB the shuffle carries
partial aggregates, not rows. Skewed book groups (one 20-hour book
per ~50, BASELINE.md) are handled by AQE skew splitting; the
collect_list aggregations bound per-group state to file counts
(≤ hundreds), never raw audio.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parts_by_book(
    df: DataFrame,
    book_col: str = "book_id",
    part_idx_col: str = "part_idx",
    path_col: str = "path",
) -> DataFrame:
    """G1: group part files per book, parts sorted by natural index
    (reference ``defaultdict(list)`` + regex sort,
    ``crawler/utils.py:85-122`` / ``process_all.py:540-610``).
    ``sort_array`` on struct(part_idx, path) gives deterministic
    order without a global sort."""
    return df.groupBy(book_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(part_idx_col), F.col(path_col)))
        ).alias("parts"),
        F.count("*").alias("n_parts"),
    )


def success_counts(df: DataFrame, flag_col: str) -> DataFrame:
    """G4: success/failure tallies (``crawler/download.py:248-257``)."""
    return df.groupBy(flag_col).agg(F.count("*").alias("n"))


def corpus_duration_hours(df: DataFrame, duration_col: str = "duration") -> DataFrame:
    """G5: total corpus duration in hours
    (``push_to_hf.py:125-127,143-144``)."""
    return df.agg((F.sum(duration_col) / 3600.0).alias("total_hours"))


def weighted_wer(
    df: DataFrame,
    group: str | list[str] = "book_id",
    errors_col: str = "word_errors",
    ref_words_col: str = "ref_words",
) -> DataFrame:
    """G6: corpus WER per book = sum(errors)/sum(ref words) × 100 —
    the weighted formulation that matches ``jiwer.wer`` over a list
    of references (``whisper_qc.py:322-329``), NOT a mean of per-row
    WERs."""
    groups = [group] if isinstance(group, str) else group
    return df.groupBy(*groups).agg(
        (
            F.sum(errors_col).cast("double")
            / F.sum(ref_words_col).cast("double")
            * 100.0
        ).alias("wer_pct"),
        F.sum(ref_words_col).cast("long").alias("total_ref_words"),
        F.count("*").alias("n_utts"),
    )


def min_sample_rate(
    df: DataFrame, book_col: str = "book_id", sr_col: str = "sample_rate"
) -> DataFrame:
    """G7: min sample rate over a book's parts decides qualification
    (``process_all.py:502-509``)."""
    return df.groupBy(book_col).agg(F.min(sr_col).alias("min_sr"))


def flag_ratio(df: DataFrame, pred: Column, name: str = "ratio") -> DataFrame:
    """G8: fraction of rows matching a predicate (invalid-URL pct,
    ``crawler/metadata.py:396-399``) — avg of a 0/1 indicator, one
    scan, map-side combinable."""
    return df.agg(F.avg(pred.cast("double")).alias(name))


def per_group_metrics(
    df: DataFrame,
    group: str | list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """G9/G10 generic: named multi-metric group summary."""
    groups = [group] if isinstance(group, str) else group
    return df.groupBy(*groups).agg(*[c.alias(n) for n, c in aggs.items()])


def rollup_stats(
    df: DataFrame,
    dims: list[str],
    aggs: dict[str, Column],
    cube: bool = False,
) -> DataFrame:
    """Corpus stats with subtotals — SURVEY §2.4 notes the reference
    has no grouping sets; Spark gives rollup/cube for free. A
    ``grouping_id`` column disambiguates subtotal rows from real NULL
    dimension values."""
    grouped = df.cube(*dims) if cube else df.rollup(*dims)
    return grouped.agg(
        F.grouping_id().cast("int").alias("gid"),
        *[c.alias(n) for n, c in aggs.items()],
    )


def rollup_cascade(
    df,
    ts_col: str = "ts",
    value_col: str = "value",
    places: int = 2,
    levels: tuple[str, ...] = ("minute", "hour", "day"),
):
    """Hypertable-style cascading time rollup: aggregate at the finest
    grain, then each coarser level aggregates the PREVIOUS level's
    partials — never the raw rows. Exactness holds because counts and
    scaled-integer sums are associative (floor once per row, then sum
    in any grouping order). At 100 TB the minute level is the only
    pass over raw data; hour/day read partial tables that are orders
    of magnitude smaller — the continuous-aggregate pattern.

    Returns {level: DataFrame(bucket, n_events, scaled_sum)} with the
    scaled integer EXPOSED so callers divide once at the edge."""
    from pyspark.sql import functions as F

    scale = float(10**places)
    out = {}
    cur = df.groupBy(
        F.date_trunc(levels[0], ts_col).alias("bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col(value_col) * scale + F.lit(0.5))).alias("scaled_sum"),
    )
    out[levels[0]] = cur
    for lvl in levels[1:]:
        cur = cur.groupBy(F.date_trunc(lvl, "bucket").alias("bucket")).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("scaled_sum").alias("scaled_sum"),
        )
        out[lvl] = cur
    return out
