"""Relational operator library (SURVEY.md §2.2-§2.6 + north-star
dedup/similarity extensions). Each module exposes small DataFrame →
DataFrame builders; queries in ``__spark_entry__.py`` compose them.
"""

from vnavc_spark.operators import (
    aggregates,
    dedup,
    filters,
    joins,
    ordering,
    restructure,
    sampling,
    similarity,
)

__all__ = [
    "filters",
    "joins",
    "aggregates",
    "ordering",
    "restructure",
    "sampling",
    "dedup",
    "similarity",
]
