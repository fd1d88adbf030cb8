"""Lexical retrieval: BM25 scoring and top-k over a token corpus.

The reference pipeline has no retrieval engine; this extends the
engine for LLM training-data curation (query-driven corpus
exploration, contamination triage, eval-set mining). Spark-first
shape, sized for a 100 TB corpus:

- term statistics (tf, doc length, document frequency, corpus size)
  are map-side-combinable aggregations over the exploded token view —
  one shuffle each, integer rows only;
- the query term set is small by contract (a handful of query
  strings) → broadcast equi-join on ``tok``; the corpus tf table is
  never shuffled on the term key;
- per-(query, doc) scores aggregate with a partial (map-side) sum of
  scaled integers; top-k is a per-query window over (qid, doc_id,
  score) rows — document text never rides any shuffle.

BM25 idf uses the log-free rational form ``(N - df + 0.5)/(df + 0.5)``
instead of ``ln(...)`` because JVM StrictMath and libm ``ln`` differ
in the last ulp on ~2.5% of inputs (measured — see
functions/portable.py), which would make cross-engine hash
certification luck-dependent. Ranking is order-isomorphic for terms
with df ≤ N/2 (the useful ones), and the ``ln`` form is a one-line
swap where bit-exact certification isn't needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vnavc_spark.functions.portable import exact_sum


def term_frequencies(tokens: DataFrame, doc_col: str = "doc_id",
                     tok_col: str = "tok") -> DataFrame:
    """(doc, tok) → count. One map-side-combinable aggregation."""
    return tokens.groupBy(doc_col, tok_col).agg(F.count("*").alias("cnt"))


def bm25_topk(
    tf: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    places: int = 6,
) -> DataFrame:
    """Score every (query, document) pair sharing a term; keep top-k
    docs per query.

    Parameters
    ----------
    tf : DataFrame(doc_id, tok, cnt) — corpus term frequencies.
    queries : DataFrame(qid, tok) — distinct query terms; SMALL by
        contract (broadcast).

    Returns DataFrame(qid, doc_id, score, rnk) with ``rnk`` 1..k per
    query, ties broken by doc_id.

    The per-term partial score is rounded to ``places`` decimals and
    summed as scaled integers (order-independent — see
    functions/portable.exact_sum), so the result is bit-identical
    across engines and partitionings.
    """
    dl = tf.groupBy("doc_id").agg(F.sum("cnt").alias("dl"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )

    cnt = F.col("cnt").cast("double")
    # dl/avgdl rendered rationally: (dl * n_docs) / total_len — one
    # division of exact integer products (avgdl never materialized,
    # so no compounding rounding).
    len_norm = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
        "total_len"
    ).cast("double")
    sat = cnt * F.lit(k1 + 1.0) / (
        cnt + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * len_norm)
    )
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))

    scored = (
        tf.join(F.broadcast(queries), on="tok")
        .filter(F.col("doc_id") != F.col("qid"))
        .join(dl, on="doc_id")
        .join(dfreq, on="tok")
        .crossJoin(F.broadcast(n))
        .groupBy("qid", "doc_id")
        .agg(exact_sum(sat * idf, places).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("qid", "doc_id", "score", "rnk")
    )


def dcg_discounts(k: int) -> list[float]:
    """Rank discounts 1/log2(rank+1) for ranks 1..k, pre-rounded
    floor(x·1e9 + 0.5)/1e9 — emitted as RATIONAL DECIMAL LITERALS
    instead of a runtime log2, because JVM and libm transcendentals
    differ in the last ulp (the BM25 log-free-idf stance): both
    engines consume the IDENTICAL literal per rank, so the DCG term
    trees are bit-equal by construction. k is small by contract
    (top-k lists), so the table is a broadcast literal."""
    import math

    return [
        math.floor(1e9 / math.log2(i + 1) + 0.5) / 1e9
        for i in range(1, k + 1)
    ]


def ndcg_at_k(
    ranked: DataFrame,
    rel: DataFrame,
    *,
    k: int = 10,
    places: int = 6,
) -> DataFrame:
    """Exact nDCG@k of a ranked candidate list against graded
    relevance judgments — the ranking-quality metric the retrieval
    family (BM25 q60, RRF q171/q177) gets EVALUATED by, with LINEAR
    gain (gain = grade; the 2^grade−1 exponential form overflows for
    count-valued grades and adds nothing on small grade ranges —
    convention pinned here and in the oracle).

    ``ranked``: (qid, cand, rnk) with rnk 1..k (ties already broken
    deterministically upstream). ``rel``: (qid, cand, grade) over
    ALL relevant candidates — the ideal ranking needs the full
    relevance set, not just the top-k (an nDCG computed against
    truncated judgments silently inflates). A ranked candidate with
    no judgment contributes 0 gain (inner join — identical on both
    engines).

    DCG = Σ grade·w(rnk) with w from :func:`dcg_discounts`; each
    term is quantized floor(x·10^places + 0.5) BEFORE the sum
    (order-independent integer sums, the q217 stance); IDCG ranks
    the judgments by (grade DESC, cand) with a per-qid top-k window
    (WindowGroupLimit-prunable). Output: (qid, dcg, idcg, ndcg).

    Scale shape: the discount table is a k-row broadcast literal;
    DCG works on k·|queries| rows; the ideal ranking is a per-query
    top-k over the judgment table (posting-list bounded when grades
    come from term overlap)."""
    from vnavc_spark.functions.portable import stable_round

    spark = ranked.sparkSession
    disc = spark.createDataFrame(
        [(i + 1, w) for i, w in enumerate(dcg_discounts(k))],
        "rnk long, w double",
    )
    scale = float(10**places)
    term = F.floor(
        F.col("grade").cast("double") * F.col("w") * F.lit(scale)
        + F.lit(0.5)
    )
    dcg = (
        ranked.join(rel, ["qid", "cand"])
        .join(F.broadcast(disc), "rnk")
        .groupBy("qid")
        .agg((F.sum(term) / F.lit(scale)).alias("dcg_raw"))
    )
    iw = Window.partitionBy("qid").orderBy(
        F.desc("grade"), F.asc("cand")
    )
    ideal = (
        rel.withColumn("rnk", F.row_number().over(iw).cast("long"))
        .filter(F.col("rnk") <= k)
        .join(F.broadcast(disc), "rnk")
        .groupBy("qid")
        .agg((F.sum(term) / F.lit(scale)).alias("idcg_raw"))
    )
    return (
        dcg.join(ideal, "qid")
        .filter(F.col("idcg_raw") > 0)
        .select(
            "qid",
            stable_round(F.col("dcg_raw"), places).alias("dcg"),
            stable_round(F.col("idcg_raw"), places).alias("idcg"),
            stable_round(
                F.col("dcg_raw") / F.col("idcg_raw"), places
            ).alias("ndcg"),
        )
    )


def inverted_index(
    toks: DataFrame,
    n_docs: DataFrame,
    *,
    doc_col: str = "doc_id",
    tok_col: str = "tok",
    postings_per_shard: int = 1000,
    df_low_pct: int = 1,
    df_high_pct: int = 90,
) -> DataFrame:
    """token → sharded sorted posting lists, df-band filtered.

    Posting lists are sharded by document so NO ROW ever holds an
    unbounded array: ``shard = md5(doc) % K`` with
    ``K = ceil(n_docs / postings_per_shard)``, giving ~
    ``postings_per_shard`` ids per (tok, shard) row at ANY corpus
    size — a common token at 100 TB lands in many bounded rows, not
    one multi-GB array (Spark's 2 GB row/array limits). The shard
    count derives from the corpus count, so the bound is absolute,
    not relative.

    Shape: one shuffle on (tok, shard) — partial-agg combinable;
    token-level totals (n_postings, doc_freq) come from a window over
    ``tok`` whose partitions hold at most K aggregated rows (bounded,
    skew-irrelevant). The md5 shard key is engine-portable (DuckDB
    reproduces it bit-for-bit).

    Parameters
    ----------
    toks : DataFrame(doc_col, tok_col) — exploded token view.
    n_docs : one-row DataFrame(n_docs) — corpus size (broadcast).
    """
    md5int = F.conv(
        F.substring(F.md5(F.col(doc_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    k_shards = F.greatest(
        F.lit(1).cast("long"),
        F.ceil(F.col("n_docs") / F.lit(float(postings_per_shard))).cast(
            "long"
        ),
    )
    sharded = (
        toks.crossJoin(F.broadcast(n_docs))
        .withColumn("shard", F.pmod(md5int, k_shards))
    )
    ps = sharded.groupBy(tok_col, "shard").agg(
        F.min("n_docs").alias("n_docs"),
        F.count("*").alias("n_in_shard"),
        F.countDistinct(doc_col).alias("df_shard"),
        F.sort_array(F.collect_set(doc_col)).alias("postings"),
    )
    w = Window.partitionBy(tok_col)
    p = ps.withColumn(
        "n_postings", F.sum("n_in_shard").over(w).cast("long")
    ).withColumn("doc_freq", F.sum("df_shard").over(w).cast("long"))
    return p.filter(
        (F.col("doc_freq") * 100 >= F.col("n_docs") * df_low_pct)
        & (F.col("doc_freq") * 100 <= F.col("n_docs") * df_high_pct)
    ).select(tok_col, "shard", "n_postings", "doc_freq", "postings")


def rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    k: int = 10,
    c: int = 60,
    qid_col: str = "qid",
    cand_col: str = "cand",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of a
    lexical and a dense top-k list — the standard hybrid-retrieval
    combiner (BM25 ∪ ANN) in modern RAG stacks:
    ``score(d) = Σ_lists 1/(c + rank_list(d))``, missing lists
    contribute 0. RRF needs only RANKS, never the incomparable raw
    scores, which is exactly why it hash-certifies: ranks are
    integers, each reciprocal is one IEEE division, and the two-term
    sum is a FIXED expression tree (lex + dense, in that order) —
    bit-identical on any engine. The canonical c = 60 damps the
    head-heavy 1/rank curve.

    Inputs: ``lex`` (qid, cand, lex_rank) and ``dense`` (qid, cand,
    dense_rank) — 1-based ranks, each (qid, cand) unique. Shape: the
    lists are top-k-bounded by contract (k·|queries| rows), so the
    FULL OUTER join and the per-query re-rank window both run on
    list-sized data — the corpora behind the lists never reach this
    operator.

    Returns (qid, cand, n_lists, score_rrf, fused_rank ≤ k)."""
    from vnavc_spark.functions.portable import stable_round

    j = lex.join(dense, on=[qid_col, cand_col], how="full_outer")
    term = lambda col: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.col(col) + F.lit(c)).cast("double"), F.lit(0.0)
    )
    scored = j.select(
        qid_col,
        cand_col,
        (
            F.col("lex_rank").isNotNull().cast("int")
            + F.col("dense_rank").isNotNull().cast("int")
        )
        .cast("long")
        .alias("n_lists"),
        stable_round(term("lex_rank") + term("dense_rank"), 6).alias(
            "score_rrf"
        ),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("score_rrf"), F.asc(cand_col)
    )
    return (
        scored.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= k)
    )
