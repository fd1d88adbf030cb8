"""String/text scalar functions (SURVEY.md §2.7, T1-T10).

All pure Catalyst expressions — no Python UDFs. The Vietnamese
de-accent table makes T1 native: the reference does NFD-decompose +
strip combining marks (``tts_data_pipeline/__init__.py:10-29``); for
the fixed Vietnamese alphabet that is exactly a character translate,
which stays in whole-stage codegen instead of a per-row UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# T1 — normalize_name (reference __init__.py:10-29)
# ---------------------------------------------------------------------------

#: Vietnamese accented characters → NFD base letter. đ/Đ deliberately
#: NOT mapped: it is a standalone letter, not a combining mark, and the
#: reference's NFD strip keeps it (FIXTURES.md golden: "Đinh" → "đinh").
_VI_ACCENTED = (
    "àáảãạăằắẳẵặâầấẩẫậ"
    "èéẻẽẹêềếểễệ"
    "ìíỉĩị"
    "òóỏõọôồốổỗộơờớởỡợ"
    "ùúủũụưừứửữự"
    "ỳýỷỹỵ"
)
_VI_BASE = "a" * 17 + "e" * 11 + "i" * 5 + "o" * 17 + "u" * 11 + "y" * 5
assert len(_VI_ACCENTED) == len(_VI_BASE)

#: Uppercase variants are handled by lowercasing first.


def strip_vietnamese_accents(col: Column | str) -> Column:
    """De-accent Vietnamese text (lowercased input expected)."""
    return F.translate(F.col(col) if isinstance(col, str) else col, _VI_ACCENTED, _VI_BASE)


def normalize_name(col: Column | str) -> Column:
    """T1: lower → strip Vietnamese diacritics (NFD-equivalent) → drop
    punctuation except ``-`` → collapse whitespace → hyphens.

    Reference: ``tts_data_pipeline/__init__.py:10-29``.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = strip_vietnamese_accents(F.lower(c))
    c = F.regexp_replace(c, r"[^\w\sđ-]", "")  # keep word chars, space, đ, -
    c = F.regexp_replace(F.trim(c), r"\s+", "-")
    return c


# ---------------------------------------------------------------------------
# T2 — convert_duration (reference __init__.py:32-73)
# ---------------------------------------------------------------------------

def convert_duration(col: Column | str, unit: str = "hours") -> Column:
    """T2: parse ``"HH:MM:SS"`` / ``"MM:SS"`` (tolerating ``;`` for
    ``:``) into seconds/minutes/hours; NULL on parse failure.

    Implemented as a right-to-left fold over the split parts with
    base-60 place values — ``aggregate(reverse(split(...)))`` — so a
    2-part string is naturally MM:SS and a 3-part HH:MM:SS, exactly
    the reference's tolerant semantics (``__init__.py:32-73``; it has
    a duplicate impl at ``crawler/metadata.py:204-224``).
    Non-numeric parts cast to NULL which propagates to a NULL total.
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.trim(c), ";", ":")
    parts = F.split(cleaned, ":")
    # strict numeric gate: every part must be pure digits
    all_numeric = F.forall(parts, lambda p: p.rlike(r"^\s*\d+\s*$"))
    seconds = F.aggregate(
        parts,
        F.lit(0.0),
        lambda acc, x: acc * 60.0 + x.cast("double"),
    )
    seconds = F.when(all_numeric & (F.size(parts) <= 3) & (F.size(parts) >= 2), seconds)
    if unit == "seconds":
        return seconds
    if unit == "minutes":
        return seconds / 60.0
    if unit == "hours":
        return seconds / 3600.0
    raise ValueError(f"unknown unit {unit!r}")


# ---------------------------------------------------------------------------
# T5 / T7 — punctuation strip & transcript cleaning
# ---------------------------------------------------------------------------

#: string.punctuation, the exact set the reference removes
#: (``process_all.py:281-283`` uses str.translate over it).
PUNCTUATION = r"""!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""


def strip_punctuation(col: Column | str, keep: str = "") -> Column:
    """T5: remove ASCII punctuation via ``translate`` (codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    drop = "".join(ch for ch in PUNCTUATION if ch not in keep)
    return F.translate(c, drop, "")


def clean_transcript(col: Column | str) -> Column:
    """T7 (regex part): strip curly quotes/dash/bullet/ellipsis and
    collapse whitespace (reference ``push_to_hf.py:27-49``; the
    num2words digit rewrite lives in ``vietnamese.py``)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "[“”‘’–—•…]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# ---------------------------------------------------------------------------
# T9 — deterministic ids (replaces secrets.token_hex(4))
# ---------------------------------------------------------------------------

def deterministic_id(*cols: Column | str, length: int = 8) -> Column:
    """T9: 8-hex id as sha2 of the identifying columns — reproducible
    across re-runs, unlike the reference's ``secrets.token_hex(4)``
    (``__init__.py:355-366``). Null-safe: nulls hash as empty string.
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.substring(F.sha2(F.concat_ws("", *parts), 256), 1, length)


# ---------------------------------------------------------------------------
# T10 / O1 — filename parsing & natural sort keys
# ---------------------------------------------------------------------------

def book_prefix(col: Column | str) -> Column:
    """T10: book prefix = stem up to first ``_`` (reference
    ``crawler/utils.py:114``)."""
    c = F.col(col) if isinstance(col, str) else col
    stem = F.regexp_extract(c, r"([^/]+?)(?:\.\w+)?$", 1)
    return F.split(stem, "_").getItem(0)


def trailing_int(col: Column | str) -> Column:
    """O1: natural-sort key — trailing integer before the extension
    (reference regex ``(\\d+)(?=\\.\\w+$)`` at
    ``process_all.py:612-617``); -1 when absent so unnumbered singles
    sort first."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_extract(c, r"(\d+)\.\w+$", 1)
    return F.when(digits == "", F.lit(-1)).otherwise(digits.cast("int"))


def file_stem(col: Column | str) -> Column:
    """Path → stem (basename minus extension), for J1 stem pairing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"([^/]+?)(?:\.\w+)?$", 1)
