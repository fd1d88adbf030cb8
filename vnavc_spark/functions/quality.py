"""Text-analysis functions for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All native Catalyst expressions (no UDFs) so they run
inside whole-stage codegen over 100 TB document scans.

Extension surface beyond the reference (BASELINE.json north star);
closest reference analogue is the per-book text metrics at
``pre_processing/process_all.py:358-363``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / counting
# ---------------------------------------------------------------------------

def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text → array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Number of whitespace tokens; 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate: counts word pieces + digits +
    punctuation runs with a BPE-flavored regex. Cheap proxy for LLM
    token budgeting at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    # split CamelCase, then count \w{1,6} pieces and non-space symbols
    decamel = F.regexp_replace(c, r"([a-z])([A-Z])", r"$1 $2")
    pieces = F.regexp_extract_all(decamel, F.lit(r"(\w{1,6}|[^\w\s])"), 1)
    return F.size(pieces)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

#: Tiny multilingual stopword list — heuristic signal only.
STOPWORDS = (
    "the a an and or of to in is are was were for on with as at by it "
    "this that"
).split()


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1)).cast("double")


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return n_stop / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + token shape +
    punctuation sanity. Deterministic and codegen'd; meant for
    corpus-scale filtering, not absolute judgment."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / 20.0, F.lit(1.0))  # saturates at 20 tokens
    tok_len = mean_token_len(c)
    shape_score = F.when((tok_len >= 2.5) & (tok_len <= 12.0), 1.0).otherwise(0.5)
    punct_score = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.3)
    return (len_score * 0.5 + shape_score * 0.3 + punct_score * 0.2)


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

#: Marker words per language — the classic cheap lang-ID heuristic.
_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "nicht"],
    "fr": ["le", "la", "les", "des", "est"],
    "vi": ["của", "và", "là", "không", "người"],
}


def lang_id(col: Column | str) -> Column:
    """Best-guess language from marker-word hit counts; 'und' when no
    marker matches. Pure expression: one pass over the token array per
    language, no UDF."""
    toks = tokens(F.lower(F.col(col) if isinstance(col, str) else col))
    scores = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(markers))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, markers in _LANG_MARKERS.items()
    ]
    best = F.greatest(*scores)  # struct compare: hits first, then code
    return F.when(best.getField("hits") > 0, best.getField("code")).otherwise(
        F.lit("und")
    )


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

def normalized_text(col: Column | str) -> Column:
    """Canonical form for dedup: strip to ASCII alphanumerics FIRST,
    then lower, then collapse whitespace.

    The non-alnum strip runs BEFORE lower() because engines disagree
    on pathological case foldings — Java lower('İ') is 'i' + a
    combining dot (U+0307), splitting 'İstanbul' into 'i stanbul'
    where DuckDB keeps 'istanbul'. Stripping first leaves only ASCII
    for lower(), which is engine-identical everywhere; results on
    pure-ASCII corpora are unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"[^A-Za-z0-9\s]", " ")
    c = F.lower(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint = md5 of the normalized text (exact-dup
    key; md5 chosen because the DuckDB oracle computes the identical
    digest)."""
    return F.md5(normalized_text(col))


# ---------------------------------------------------------------------------
# corpus-filter rule sets (C4 / Gopher style)
# ---------------------------------------------------------------------------

def symbol_word_ratio(col: Column | str, symbols: str = "#…") -> Column:
    """Gopher rule input: symbols per word (hash/ellipsis density)."""
    c = F.col(col) if isinstance(col, str) else col
    n_sym = F.length(c) - F.length(F.translate(c, symbols, ""))
    return n_sym / F.greatest(token_count(c), F.lit(1)).cast("double")


def stopword_hits(col: Column | str) -> Column:
    """Number of DISTINCT stopwords present — the Gopher 'has ≥2
    stopwords' naturalness signal."""
    toks = F.array_distinct(tokens(F.lower(F.col(col) if isinstance(col, str) else col)))
    return F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))


def c4_quality_gate(
    col: Column | str,
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stopword_hits: int = 2,
) -> Column:
    """Composite C4/Gopher-style keep flag — every signal is a pure
    codegen'd expression, so the gate rides the scan at 100 TB
    (standard public rule set: word-count band, mean-word-length
    band, symbol density cap, stopword floor)."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    mwl = mean_token_len(c)
    return (
        (n >= min_words)
        & (n <= max_words)
        & (mwl >= min_mean_word_len)
        & (mwl <= max_mean_word_len)
        & (symbol_word_ratio(c) <= max_symbol_ratio)
        & (stopword_hits(c) >= min_stopword_hits)
    )


# ---------------------------------------------------------------------------
# PII scrubbing (emails / phones / URLs), RE2-portable patterns
# ---------------------------------------------------------------------------

#: patterns deliberately restricted to the Java∩RE2 regex subset (no
#: lookaround, no backrefs) so the DuckDB oracle runs them verbatim
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_PHONE = r"\+?\d[\d .-]{7,}\d"


def count_matches(col: Column | str, pattern: str) -> Column:
    """Occurrences of a regex in the text (codegen'd)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def scrub_pii(col: Column | str) -> Column:
    """Mask emails/URLs/phones with typed placeholders. Order is
    load-bearing: URLs first (they may embed @ and digits), then
    emails, then phone-shaped digit runs."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, PII_URL, "<URL>")
    c = F.regexp_replace(c, PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, PII_PHONE, "<PHONE>")
    return c
