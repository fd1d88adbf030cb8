"""Partitioning-independence regression: a registry result must not
depend on how Spark happens to partition the shuffle — float
summation order, sample selection, and narrowing-state collection are
the classic leaks. The full 121-query audit passed at shuffle
partitions 4 vs 7 (round 4); this pins the most hash-sensitive
subset so a regression fails fast in CI rather than flaking at the
driver's correctness gate.
"""

from __future__ import annotations

from conftest import SF_SMALL

# queries whose results would drift FIRST if partition-order ever
# leaked: float aggregations (exact_sum pattern), md5-order sampling,
# driver-state narrowing, order-invariant checksums, decimal filters
SENSITIVE = [
    "q03_pricing_summary",  # scaled-integer float sums
    "q12_exact_k_sample",  # md5-order exact-k sampling
    "q39_global_sample",
    "q42_percentiles",  # narrowing driver state
    "q94_bootstrap_ci",  # md5-derived Poisson weights
    "q99_table_checksum",  # bit_xor order invariance
    "q107_revenue_trend",  # integer moments -> double OLS
    "q113_exact_median_scalable",
    "q118_distribution_drift",  # decimal numerators, edge division
    "q119_collocations",  # decimal cross-multiplied filter
    "q121_exact_mad_scalable",  # chained narrowing
    "q122_skyline",  # mapInPandas local-skyline merge
    "q123_weighted_median",  # weighted narrowing state
    "q129_changepoint",  # double argmax over integer prefix sums
    "q130_max_concurrency",  # two-level sweep prefix regroup
    "q132_pps_sample",  # two-level cumsum + integer step boundaries
    "q133_correlation_matrix",  # integer moments -> double r
    "q144_shipping_priority",  # top-k cut under ties
    "q147_weighted_p90",  # weighted narrowing state
    # round 7: narrowing-boundary classification (driver state +
    # banded tie ranks), min-label propagation (per-round convergence
    # counts), chunked incremental staging (anti-join deltas),
    # per-stratum two-level cumsum boundaries
    "q126_rfm_segments",
    "q138_decile_lift",
    "q152_copurchase_communities",
    "q154_rolling_dau_incremental",
    "q155_stratified_pps",
    # round 7 TPC-H completion wave: exact-cent revenue sums with a
    # single terminal division (market share), top-k cuts under ties
    # with unique-key tiebreaks, cross-multiplied above-average test
    "q162_market_share",
    "q166_large_volume_customers",
    "q168_waiting_suppliers",
    "q169_dormant_high_balance",
    # round 8: range-partitioned CDF carries (partition-independence
    # is the operator's core claim), md5-HLL register maxima (order-
    # free by construction — max is commutative — but the harmonic
    # sum and single division must not drift either)
    "q170_ks_drift",
    "q47_approx_sketches",
    # iterated argmax under count ties (pair-ASC tiebreak) — a drift
    # in round r's winner rewrites every later round's counts
    "q172_bpe_train",
    # round 8 back half: two-level island sweep (running-max +
    # break-sum regroup must be exact under any partitioning), the
    # encode twin of the iterated argmax, and a semi-join membership
    # count (order-free, but the flag threshold must not drift)
    "q173_interval_coverage",
    "q174_bpe_encode",
    "q175_bigram_oov_gate",
    # two Lloyd iterations: any partition-dependent drift in the
    # iteration-1 centroid means amplifies through iteration 2
    "q176_kmeans_refine",
    # round 10: spark_partition_id rides the cumsum carries inside
    # the separation core (partition-independence is the claim), and
    # the linkage candidate set must be identical under any variant
    # bucketing
    "q202_name_linkage",
    "q203_weekend_value_auc",
    # round 10 back half: the composite-key cumsum rides the same
    # carries; the radius-2 candidate set and the recall-audit
    # sample must be identical under any bucketing/partitioning
    "q204_daily_night_auc",
    "q206_blocking_recall_audit",
    "q207_radius2_linkage",
]


class TestPartitionIndependence:
    def test_sensitive_queries_hash_identically_across_partitionings(
        self, spark
    ):
        # the session fixture runs at 4 shuffle partitions; compare
        # against a prime partition count on the same session by
        # flipping the runtime conf (shuffle.partitions is honored at
        # execution time)
        from vnavc_spark.oracle import value_hash
        from vnavc_spark.queries import all_queries

        qs = all_queries()
        base = {}
        for name in SENSITIVE:
            df = qs[name](spark, SF_SMALL)
            base[name] = value_hash(
                [tuple(r) for r in df.collect()],
                [c.lower() for c in df.columns],
            )
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        try:
            for name in SENSITIVE:
                df = qs[name](spark, SF_SMALL)
                h = value_hash(
                    [tuple(r) for r in df.collect()],
                    [c.lower() for c in df.columns],
                )
                assert h == base[name], (
                    f"{name}: result depends on shuffle partitioning"
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
