"""Deduplication operators — exact, n-gram Jaccard, MinHash(+LSH),
SimHash. North-star extension surface (BASELINE.json): the reference
has NO dedup at all (SURVEY §2.6 R5 — re-crawls silently duplicate
rows); a 100 TB training-data pipeline lives or dies on this.

Determinism & portability: all hashing is md5-derived so the DuckDB
correctness oracle can compute byte-identical signatures. At scale
the md5 calls are JVM-side codegen'd expressions — no Python.

Scale shape:
- exact dedup: map-side-combinable aggregate on the fingerprint.
- MinHash: per-doc signature is a pure projection (no shuffle);
  the only shuffle is the band-bucket grouping, which carries
  (band_key, doc_id) pairs — tiny rows — never document text.
- SimHash: pure projection per doc; near-dup candidates group on the
  16-bit prefix.
- n-gram Jaccard: exploded shingle self-join — quadratic in bucket
  size, so it is the *verify* stage after LSH candidate generation,
  never run corpus-wide.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vnavc_spark.functions.quality import fingerprint, normalized_text, tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of exact duplicates by normalized-text fingerprint:
    (fingerprint, n_docs, representative min id)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def drop_exact_dups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one representative (min id) per fingerprint — one shuffle
    on the 32-char fingerprint, text never shuffled twice."""
    w_keep = exact_dup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(w_keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------

def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text, as an
    array<string>.

    Built by zip_with-composing the token array with shifted slices
    of itself — each lambda touches its ELEMENT arguments only.
    (A transform over positions with ``element_at(toks, i+j)`` would
    re-evaluate the whole tokenization per element: Spark evaluates
    higher-order-function lambdas interpreted, and captured outer
    expressions are recomputed at every reference — measured as a
    multiplicative blowup at sf0.1.)"""
    toks = tokens(normalized_text(text_col))
    sh: Column = toks
    for j in range(1, n):
        shifted = F.slice(
            toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0))
        )
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    # zip_with null-pads the shorter side → tail entries are null;
    # keep only the size-n+1 real shingles
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    sh = F.when(k > 0, F.slice(sh, 1, k)).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(sh)


# Python mirror of the shingle pipeline (used by the Arrow-batched
# signature pass below — must stay semantically identical to
# normalized_text → tokens → n-grams → distinct).
_NON_ALNUM = re.compile(r"[^a-z0-9\s]")
_WS = re.compile(r"\s+")


def _py_shingles(text: str | None, n: int = 3) -> list[str]:
    if not text:
        return []
    norm = _WS.sub(" ", _NON_ALNUM.sub(" ", text.lower())).strip()
    toks = norm.split(" ") if norm else []
    if len(toks) < n:
        return []
    seen: dict[str, None] = {}
    for i in range(len(toks) - n + 1):
        seen.setdefault(" ".join(toks[i : i + n]), None)
    return list(seen)


def explode_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) rows — the input to Jaccard verification."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (verification / small-bucket path)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All document pairs with shingle-Jaccard ≥ threshold.

    Shuffle shape: explode → self-equi-join on shingle → pair-count
    agg. The join key is the shingle, so common shingles fan out —
    acceptable as the verify stage on LSH candidates; guarded at
    corpus scale by running per LSH bucket.
    """
    sizes = df.select(
        F.col(id_col), F.size(word_shingles(text_col, n)).alias("n_sh")
    )
    ex = explode_shingles(df, id_col, text_col, n)
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("sh_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("sh_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("sh_a") + F.col("sh_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """(id, sig: array<string>) — signatures computed in ONE
    Arrow-batched pass (``mapInPandas``).

    Why Python here and not Catalyst expressions: higher-order-
    function lambdas are evaluated interpreted and re-evaluate
    captured outer expressions per element, so a pure-expression
    16-hash signature recomputes the shingle pipeline ~16× per row
    (and projection collapse inlines it further downstream) —
    measured 175 s at sf0.1 vs seconds for this single pass. The
    mapInPandas node is also a hard optimizer barrier: downstream
    getItems reference materialized attributes, never the expression
    tree. md5 digests are identical to SQL ``md5()`` so the DuckDB
    oracle still matches byte-for-byte.

    Scale: output rows are ~num_hashes×32 bytes — the natural
    Parquet staging table for incremental dedup. The input is
    repartitioned first: a small-file corpus arrives as few
    partitions, which would serialize the Python pass on one core
    (measured 16× underuse at sf0.1)."""
    import hashlib

    from collections.abc import Iterator as _It

    def _sig(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        prefixes = [f"{s}|".encode() for s in range(num_hashes)]
        for pdf in batches:
            ids, sigs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                sh = [s.encode() for s in _py_shingles(t, n)]
                if not sh:
                    continue
                ids.append(i)
                sigs.append(
                    [
                        min(hashlib.md5(p + s).hexdigest() for s in sh)
                        for p in prefixes
                    ]
                )
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"), "sig": sigs})

    src = df.select(id_col, text_col)
    n_parts = src.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < n_parts:
        src = src.repartition(n_parts)
    return src.mapInPandas(_sig, schema=f"{id_col} long, sig array<string>")


def minhash_bands(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
) -> DataFrame:
    """(doc_id, band_idx, band_key) rows: band_key = md5 of the
    concatenated signature slice. Docs sharing any band_key are
    near-dup candidates. Built on the materialized signature table —
    band extraction is plain column ops over it."""
    nbands = num_hashes // band_size
    sig = minhash_signatures_df(df, id_col, text_col, num_hashes, n)
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.col("sig").getItem(b * band_size + j)
                        for j in range(band_size)
                    ],
                )
            ).alias("band_key"),
        )
        for b in range(nbands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(
        id_col,
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_key").alias("band_key"),
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
) -> DataFrame:
    """Distinct candidate near-dup pairs from LSH banding. The
    band-bucket self-join carries only (band_key, doc_id)."""
    bands = minhash_bands(df, id_col, text_col, num_hashes, band_size, n)
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, on=["band_idx", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify.
    This is the scale path: Jaccard's quadratic join runs only on the
    candidate pairs."""
    # candidates are tiny relative to the corpus and referenced three
    # times below (ids union, semi-join, final filter) — persist so the
    # LSH pipeline runs once, not per consumer
    cands = minhash_candidates(df, id_col, text_col, num_hashes, band_size, n).persist()
    cand_ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .union(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    subset = df.join(cand_ids, on=id_col, how="left_semi")
    verified = jaccard_pairs(subset, id_col, text_col, n, threshold)
    return verified.join(cands, on=["doc_a", "doc_b"], how="left_semi")


# ---------------------------------------------------------------------------
# SimHash (32-bit, oracle-portable derivation)
# ---------------------------------------------------------------------------

def simhash32(text_col: Column | str) -> Column:
    """32-bit SimHash of the normalized token set.

    Bit i = sign of Σ_tokens (parity of hex char i of md5(token)),
    mapping parity {0,1} → {-1,+1}. Hex-char parity keeps the
    derivation portable to the SQL oracle (no 64-bit hex→int
    conversion needed). Pure per-row expression: zero shuffle."""
    toks = F.array_distinct(tokens(normalized_text(text_col)))
    bit_votes = [
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + (F.ascii(F.substring(F.md5(t), i + 1, 1)) % 2) * 2
            - 1,
        )
        for i in range(32)
    ]
    out = F.lit(0).cast("long")
    for i, v in enumerate(bit_votes):
        out = out + F.when(v > 0, F.lit(2 ** i).cast("long")).otherwise(F.lit(0))
    return out


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash values via popcount of
    XOR (bit_count is native)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the high prefix bits
    (docs differing in ≤ max_hamming bits usually share the prefix
    block; multi-probe over rotations is the production extension),
    then verify Hamming distance within blocks."""
    sh = df.select(F.col(id_col), simhash32(text_col).alias("sh"))
    blocked = sh.withColumn(
        "block", F.shiftright(F.col("sh"), 32 - prefix_bits)
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, on="block")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn(
            "hamming", simhash_hamming(F.col("a.sh"), F.col("b.sh"))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            "hamming",
        )
    )
