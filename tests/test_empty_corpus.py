"""Robustness: every registered query must run (returning zero rows,
not raising) on a schema-identical EMPTY corpus — the state every
incremental/backfill pipeline passes through on its first run."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from vnavc_spark.io import TESTDATA_TABLES, table
from vnavc_spark.queries import all_queries


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TESTDATA_TABLES:
        table(spark, SF_SMALL, t).limit(0).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


def test_every_query_survives_empty_corpus(spark, empty_dir):
    fails = []
    for name, fn in all_queries().items():
        try:
            fn(spark, empty_dir).count()
        except Exception as e:  # noqa: BLE001
            fails.append((name, str(e).splitlines()[0][:120]))
    assert not fails, fails


@pytest.fixture(scope="module")
def nulls_dir(spark, tmp_path_factory):
    """sf0.001 with ~10% nulls injected into nullable payload columns
    (keys stay non-null) — the 100 TB fact of life every operator
    must tolerate."""
    from pyspark.sql import functions as F

    dst = tmp_path_factory.mktemp("sf_nulls")
    mod = {
        "documents": ("text", "lang", "source"),
        "events": ("value", "event_type"),
        "orders": ("o_orderstatus",),
        "embeddings": ("label",),
        # round-4 review: null VALUE columns exposed latent oracle
        # divergences in the narrowing family (count(*) counted rows
        # whose value the Spark core drops)
        "lineitem": ("l_extendedprice", "l_quantity"),
    }
    for t in TESTDATA_TABLES:
        df = table(spark, SF_SMALL, t)
        for col in mod.get(t, ()):
            bucket = F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(col), F.col(df.columns[0]).cast("string")
                            )
                        ),
                        1,
                        6,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(100),
            )
            df = df.withColumn(
                col, F.when(bucket < 10, F.lit(None)).otherwise(F.col(col))
            )
        df.write.mode("overwrite").parquet(str(dst / f"{t}.parquet"))
    return str(dst)


def test_every_query_survives_null_payloads(spark, nulls_dir):
    fails = []
    for name, fn in all_queries().items():
        try:
            fn(spark, nulls_dir).count()
        except Exception as e:  # noqa: BLE001
            fails.append((name, str(e).splitlines()[0][:120]))
    assert not fails, fails


@pytest.fixture(scope="module")
def degen_dir(spark, tmp_path_factory):
    """1000 IDENTICAL documents — worst-case boilerplate. Bucket caps
    and posting shards must keep every dedup-family query bounded."""
    from pyspark.sql import functions as F

    dst = tmp_path_factory.mktemp("sf_degen")
    base = "mot hai ba bon nam sau bay tam chin muoi " * 20
    spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit(base).alias("text"),
        F.lit("vi").alias("lang"),
        F.lit("src0").alias("source"),
        F.lit(len(base)).cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(str(dst / "documents.parquet"))
    for t in TESTDATA_TABLES:
        if t == "documents":
            continue
        table(spark, SF_SMALL, t).write.mode("overwrite").parquet(
            str(dst / f"{t}.parquet")
        )
    return str(dst)


DEGEN_QUERIES = (
    "q20_union_dedup",
    "q33_minhash_dedup",
    "q56_dedup_clusters",
    "q61_duplicate_spans",
    "q65_chunk_dedup",
    "q68_cdc_chunks",
    "q82_inverted_index",
    "q106_dedup_apply",
)


def test_dedup_suite_survives_identical_corpus(spark, degen_dir):
    # all-identical docs: every query completes (caps drop the
    # degenerate LSH bucket — exact dedup q20 owns identical copies)
    qs = all_queries()
    fails = []
    for name in DEGEN_QUERIES:
        try:
            qs[name](spark, degen_dir).count()
        except Exception as e:  # noqa: BLE001
            fails.append((name, str(e).splitlines()[0][:120]))
    assert not fails, fails
    # the exact-dup path collapses the corpus to ONE representative
    from vnavc_spark.io import table as T
    from vnavc_spark.operators.dedup import drop_exact_dups

    kept = drop_exact_dups(T(spark, degen_dir, "documents")).count()
    assert kept == 1


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    """sf0.001 plus documents in scripts with pathological case
    foldings (Turkish İ, Greek Σ, CJK, RTL, emoji) — engines disagree
    on full-vs-simple Unicode lowering, so every text operator must
    normalize in an engine-identical order."""
    dst = tmp_path_factory.mktemp("sf_unicode")
    uni = [
        (900001, "Xin chào thế giới — đây là tiếng Việt có dấu", "vi", "web", 44),
        (900002, "日本語のテキストと漢字が含まれています", "ja", "web", 19),
        (900003, "emoji 😀🎉 mixed with ASCII tokens and tabs\there", "en", "web", 45),
        (900004, "العربية نص من اليمين إلى اليسار", "ar", "web", 31),
        (900005, "Ωμέγα ΔΕΛΤΑ ΚΕΦΑΛΑΙΑΣ greek CASE folding", "el", "web", 41),
        (900006, "ß SHARP-S and İstanbul dotted-I TURKISH edge", "tr", "web", 44),
    ]
    for t in TESTDATA_TABLES:
        df = table(spark, SF_SMALL, t)
        if t == "documents":
            extra = spark.createDataFrame(
                uni,
                "doc_id long, text string, lang string, source string,"
                " n_chars long",
            )
            df = df.unionByName(extra)
        df.write.mode("overwrite").parquet(str(dst / f"{t}.parquet"))
    return str(dst)


UNICODE_SENSITIVE = (
    "q27_simhash",
    "q33_minhash_dedup",
    "q46_text_stage",
    "q50_repetition_stats",
    "q57_vocabulary",
    "q95_rolling_fingerprint",
    "q109_ngram_novelty",
    "q114_nucleus_vocab",
    "q125_intra_doc_repetition",  # round-4: per-row n-gram arrays
)


def test_text_queries_hash_match_on_unicode_corpus(spark, unicode_dir):
    from vnavc_spark.oracle import compare, duckdb_connect
    from vnavc_spark.queries import all_oracles

    con = duckdb_connect(unicode_dir)
    qs, oracles = all_queries(), all_oracles()
    fails = []
    for name in UNICODE_SENSITIVE:
        r = compare(spark, con, qs[name], oracles[name], unicode_dir)
        if not r["ok"]:
            fails.append((name, r["rows_spark"], r["rows_duck"]))
    assert not fails, fails


@pytest.fixture(scope="module")
def nulls_oracle(nulls_dir):
    from tests.oracle_harness import duckdb_connect

    return duckdb_connect(nulls_dir)


# Queries whose null-key semantics the round-4 cross-engine audit
# either fixed (q41/q59/q70/q95/q136: NULL propagation through CASE
# ladders, equi-join key loss in recursive folds, concat_ws-skips vs
# ||-nulls, size(NULL) = -1 vs len(NULL) = NULL) or exercises hardest
# (windows, lag/lead, grouping, and distinct over nullable payload
# columns). HASH-compared vs DuckDB on the null-injected corpus —
# the plain survival sweep above can't see a silent value divergence.
NULL_SENSITIVE = [
    "q41_lang_id",
    "q59_sequence_packing",
    "q70_transition_pagerank",
    "q95_rolling_fingerprint",
    "q136_journey_trigrams",
    "q31_sessionize",
    "q32_hourly_stats",
    "q40_quality_scores",
    "q51_c4_gate",
    "q57_vocabulary",
    "q63_temperature_mixture",
    "q66_stratified_split",
    "q73_cohort_retention",
    "q75_scd2_history",
    "q80_outlier_zscore",
    "q96_grouping_sets",
    "q125_intra_doc_repetition",
    "q126_rfm_segments",
    "q129_changepoint",
    "q130_max_concurrency",
    "q137_rolling_dau",
    "q139_seasonality_grid",
    "q141_new_vs_returning",
    "q142_cart_abandonment",
    # narrowing family over null-injected lineitem values (round-4
    # review: oracles must drop null-value rows like the Spark core)
    "q42_percentiles",
    "q113_exact_median_scalable",
    "q115_exact_percentiles_scalable",
    "q121_exact_mad_scalable",
    "q123_weighted_median",
    "q134_mad_fences",
    "q147_weighted_p90",
    # round-7 additions: the new event/lineitem queries all carry
    # explicit null-key semantics (drop) — hash-compare them too
    "q150_supplier_part_counts",
    "q151_promising_suppliers",
    "q153_seasonality_anomalies",
    "q154_rolling_dau_incremental",
    "q155_stratified_pps",
    "q156_window_topk",
    "q157_doc_length_deciles",
    # round-8: the KS grid drops null source/n_chars explicitly on
    # both engines — hash-compare on the null-injected corpus
    "q170_ks_drift",
    # round-8 back half: null text must vanish identically from the
    # BPE word table (explode(NULL) vs unnest(NULL)), null lang must
    # never match the reference-vocab filter, null event users ride
    # the session partitioning
    "q173_interval_coverage",
    "q174_bpe_encode",
    "q175_bigram_oov_gate",
    # round-9 back half: null lang must fall into the NEGATIVE class
    # (not drop) in the AUC label, null source/n_chars drop from the
    # separation/decile grids, null quantity/discount drop from the
    # kendall cells, null event fields drop from the daily series,
    # null text/lang/n_chars drop from the manifest identically in
    # both engines
    "q186_score_separation",
    "q187_kendall_tau",
    "q192_quantile_drift",
    "q193_autocorr",
    "q194_hhi_concentration",
    "q196_k_anonymity",
    "q197_robust_trend",
    "q198_cusum_alarm",
    "q200_pipeline_manifest",
    # round-10: null value/ts/event_type must drop from the weekend
    # AUC grid identically in both engines
    "q203_weekend_value_auc",
    # round-10 back half: null event fields drop from the daily AUC
    # grid, null totalprice/mktsegment drop from the digit masses,
    # null names drop from the ER blocking on both engines
    "q204_daily_night_auc",
    "q205_benford_summation",
    "q206_blocking_recall_audit",
    "q207_radius2_linkage",
    # round-12: null names must drop from the ER entity table but
    # KEEP their record rows in the rekey output (entity_id null, the
    # coalesce-of-null contract) identically in both engines; null
    # source/n_chars drop from the digit masses; the radius-2 audit
    # samples only non-null names
    "q211_entity_rekey",
    "q213_radius2_recall_audit",
    "q214_source_benford_summation",
    # round-13: the staged ER composition inherits q211's null
    # contract through the SAME left join (null names drop from
    # blocking, their records survive the rekey); null
    # quantity/price/discount/returnflag rows drop from the weighted
    # AUC and calibration grids, null value/ts/event_type from the
    # AP grid, identically in both engines
    "q215_er_pipeline_staged",
    "q216_quantity_weighted_auc",
    "q217_average_precision",
    "q218_discount_calibration",
    # round-13 back half: null text vanishes identically from the
    # token/judgment tables (the q60 conventions); null
    # custkey/orderdate drop from the survival spans
    "q219_bm25_ndcg",
    "q220_churn_hazard",
    "q221_isotonic_calibration",
    "q222_discount_return_trend",
    "q223_session_survival",
]


def test_null_sensitive_queries_hash_match_on_null_corpus(
    spark, nulls_dir, nulls_oracle
):
    from tests.oracle_harness import compare
    from vnavc_spark.queries import all_oracles

    oracles = all_oracles()
    qs = all_queries()
    fails = []
    for name in NULL_SENSITIVE:
        try:
            r = compare(spark, nulls_oracle, qs[name], oracles[name], nulls_dir)
            if not r["ok"]:
                fails.append((name, "hash/rows mismatch"))
        except Exception as e:  # noqa: BLE001
            fails.append((name, str(e).splitlines()[0][:120]))
    assert not fails, fails
