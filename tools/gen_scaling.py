#!/usr/bin/env python
"""Round-stamped scaling sweep: replicate the sf0.1 testdata with
shifted keys (10x, optionally 100x for the cheap relational paths),
run the representative query set through the noop sink at each
factor, and emit ``docs/SCALING_r{N}.json`` — the machine-readable
version of SCALE.md's "Measured 10x and 100x scaling" table, so the
cross-round evidence is a generated artifact instead of prose.

Usage:
    python tools/gen_scaling.py --round 4 [--skip-100x] \
        [--base /root/testdata/sf0.1] [--work /tmp/scale_work]

Replication shifts every key column by ``copy * stride`` so joins
and groupBys see genuinely distinct entities per copy; document TEXT
is replicated verbatim (each dup group becomes a (factor)-clique —
dedup output grows ~factor^2, which is the honest stress for the
near-dup suite and is annotated in the artifact). Wall-clock ratios
<= data growth mean no superlinear term; ratios >> growth are flagged
``"superlinear": true`` for the round log to investigate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key columns shifted per copy: (table, {col: stride}). Only PRIMARY
# keys (and FKs into other REPLICATED tables) shift — FKs into
# passthrough dims (o_custkey → customer) must NOT shift, or every
# replicated copy orphans out of the dim join and the "scaled" run
# measures mostly-dropped rows. Copies therefore FAN OUT onto the
# fixed dims (more orders per customer), which is the realistic
# facts-grow-dims-don't shape.
SHIFTS: dict[str, dict[str, int]] = {
    "orders": {"o_orderkey": 10_000_000},
    "lineitem": {"l_orderkey": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
#: passthrough tables (copied once, no replication — dims stay dims)
PASSTHROUGH = ("region", "nation", "customer", "supplier", "part")

#: (query, tables whose growth bounds the expected wall ratio, runs
#: at 100x?, output-quadratic?) — the SCALE.md sweep set. The last
#: flag marks pair-output queries whose RESULT grows ~factor^2 under
#: verbatim-text replication (every doc becomes a factor-clique of
#: identical copies — the corpus exact-dedup removes first in a real
#: pipeline); their superlinear bar is factor^2, not factor.
SWEEP = [
    ("q01_region_revenue", ("lineitem", "orders"), True, False),
    ("q03_pricing_summary", ("lineitem",), True, False),
    ("q33_minhash_dedup", ("documents",), False, True),
    ("q61_duplicate_spans", ("documents",), False, True),
    ("q82_inverted_index", ("documents",), False, False),
    ("q94_bootstrap_ci", ("lineitem",), False, False),
    ("q99_table_checksum", ("orders",), True, False),
    ("q46_text_stage", ("documents",), False, False),
    ("q96_grouping_sets", ("orders",), True, False),
    ("q32_hourly_stats", ("events",), True, False),
    ("q75_scd2_history", ("orders",), True, False),
    ("q42_percentiles", ("lineitem",), True, False),
    ("q113_exact_median_scalable", ("lineitem",), True, False),
    # round 4: CMS-screened heavy hitters (sketch shuffle is constant
    # -> expect sublinear growth), TV drift (one (source, token)
    # shuffle), containment prefix join (round 10: the in-operator
    # clique guard collapses identical-set groups, so the formerly
    # output-quadratic verbatim-replication regime is now held to
    # the LINEAR bar — measured x10 ratio 18.8 pre-guard, 3.6 post)
    ("q116_heavy_hitters", ("documents",), False, False),
    ("q118_distribution_drift", ("documents",), False, False),
    ("q117_containment_dedup", ("documents",), False, False),
    # round 10: deletion-neighborhood linkage (variant fan-out is
    # len+1 per DISTINCT name; replicated customers are passthrough
    # dims so the entity table is constant — expect flat), weekend
    # AUC (cents grid saturates; only the count pass grows)
    ("q202_name_linkage", ("customer",), False, False),
    ("q203_weekend_value_auc", ("events",), True, False),
    # round 10 back half: daily AUC (calendar-bounded groups, cents
    # grid saturates — only the count pass grows), summation test
    # (9 x |segments| cells after one mass pass), recall audit and
    # radius-2 linkage (customer is a passthrough dim: the entity
    # table is CONSTANT under replication — flat wall is the claim;
    # candidates scale with DISTINCT names, never with records)
    ("q204_daily_night_auc", ("events",), True, False),
    ("q205_benford_summation", ("orders",), True, False),
    ("q206_blocking_recall_audit", ("customer",), False, False),
    ("q207_radius2_linkage", ("customer",), False, False),
    ("q208_fellegi_sunter", ("customer",), False, False),
    ("q209_entity_clusters", ("customer",), False, False),
    ("q210_agreement_patterns", ("customer",), False, False),
    # round 13: the staged ER composition (customer passthrough —
    # entity table CONSTANT under replication, flat wall is the
    # claim; the staged variant table is rebuilt per invocation in a
    # fresh tempdir, so staging cost is included honestly), weighted
    # AUC + calibration (bounded value grids saturate — only the
    # count pass grows), average precision (the q203 cents grid)
    ("q215_er_pipeline_staged", ("customer",), False, False),
    ("q216_quantity_weighted_auc", ("lineitem",), True, False),
    ("q217_average_precision", ("events",), True, False),
    ("q218_discount_calibration", ("lineitem",), True, False),
    # round-13 back half: nDCG (verbatim-text replication makes each
    # query term's posting list grow ~factor and every replica of a
    # query doc stays a candidate — judgment table grows ~factor, so
    # the linear bar applies), churn hazard (duration grid is
    # day-bounded; only the span pass grows; orders fan out onto the
    # fixed customer dim so per-customer spans just densify)
    ("q219_bm25_ndcg", ("documents",), False, False),
    ("q220_churn_hazard", ("orders",), True, False),
    # isotonic calibration: the fit is driver-side on the ≤22-row
    # level grid — only the count pass grows
    ("q221_isotonic_calibration", ("lineitem",), True, False),
    # trend test: one joinless moment pass onto <=2 status rows
    ("q222_discount_return_trend", ("lineitem",), True, False),
    # session survival: one user_id shuffle + the minute-bounded
    # duration grid (events replicate with shifted user_ids, so
    # sessions and spans grow ~linearly)
    ("q223_session_survival", ("events",), False, False),
    ("q120_gap_fill", ("events",), False, False),
    ("q121_exact_mad_scalable", ("lineitem",), False, False),
    ("q122_skyline", ("orders",), True, False),
    # round 4 analytics family: basket pairs (capped baskets bound
    # the per-order fanout; replicated orders add disjoint baskets ->
    # expect ~linear), interval sweep (points ~ sessions), triangle
    # wedge joins (degree-ordered; replicated cliques grow edges
    # ~linearly under key shifts), PPS cumsum, correlation moments
    ("q124_market_basket", ("lineitem",), False, False),
    ("q130_max_concurrency", ("events",), False, False),
    ("q131_triangle_count", ("lineitem",), False, False),
    ("q132_pps_sample", ("documents",), False, False),
    ("q133_correlation_matrix", ("lineitem",), True, False),
    # classic selective join + grouped top-k (WindowGroupLimit)
    ("q144_shipping_priority", ("lineitem", "orders"), True, False),
    ("q148_topk_per_group", ("lineitem",), False, False),
    # round 7: rank-bucket classification (narrowing boundaries +
    # broadcast classify -> expect ~linear in the fact scan; the old
    # window form was the dimension-partition scale-killer), the new
    # query family (communities ride disjoint replicated subgraphs;
    # incremental DAU's chunk count is time-span-bound, so replicated
    # users grow each chunk linearly; window top-k is one fact agg)
    ("q126_rfm_segments", ("orders",), True, False),
    ("q138_decile_lift", ("orders",), True, False),
    ("q149_returned_top_customers", ("lineitem", "orders"), True, False),
    ("q150_supplier_part_counts", ("lineitem",), True, False),
    ("q152_copurchase_communities", ("lineitem",), False, False),
    ("q154_rolling_dau_incremental", ("events",), True, False),
    ("q156_window_topk", ("events",), True, False),
    # round 7 TPC-H completion wave: multi-way fact joins fan out
    # onto fixed dims (Q5 analog), outer-join distribution per fixed
    # customer set grows counts not keys, per-order self-joins see
    # disjoint replicated orders (Q21 analog), anti-join against the
    # replicated recent-buyer set (Q22 analog)
    ("q160_local_supplier_volume", ("lineitem", "orders"), True, False),
    ("q163_cust_order_distribution", ("orders",), True, False),
    ("q168_waiting_suppliers", ("lineitem", "orders"), True, False),
    ("q169_dormant_high_balance", ("orders",), True, False),
    # round 8: the reworked narrowing core's other consumers (decile
    # binning over the ~20-value source dimension; adaptive rounds
    # must stay flat), the ordered_cumsum KS drift (grid is value-
    # domain x source — replication adds values via shifted doc_ids'
    # n_chars? no: n_chars replicates verbatim, so the grid is
    # CONSTANT and only the pre-aggregate scan grows), split-leakage
    # (pair output grows ~factor^2 under verbatim-text cliques, like
    # the rest of the near-dup suite), and the md5-HLL (register
    # state constant; scan grows)
    ("q157_doc_length_deciles", ("documents",), False, False),
    ("q158_split_leakage", ("documents",), False, True),
    ("q170_ks_drift", ("documents",), True, False),
    ("q47_approx_sketches", ("orders",), True, False),
    # round 8 back half: island sweep points ~ sessions (like q130),
    # BPE rounds are vocab-sized after the corpus collapse (verbatim
    # text replication keeps the vocab CONSTANT — only the word-count
    # scan grows), the OOV semi join shuffles bigram occurrences
    # (~linear; the reference vocab is constant under replication),
    # k-means assignment is one zero-shuffle corpus pass per
    # iteration with constant (cells x dim) agg state
    ("q173_interval_coverage", ("events",), True, False),
    ("q174_bpe_encode", ("documents",), False, False),
    ("q175_bigram_oov_gate", ("documents",), False, False),
    ("q176_kmeans_refine", ("embeddings",), True, False),
    # round 9: trimmed/winsorized ride the narrowing selector
    # (rounds ~ log(range), corpus passes constant); TWA is one
    # per-user window + tiny agg; contamination shingles grow
    # linearly but the benchmark side is a fixed 1% split (hits grow
    # ~linearly under verbatim replication — every clique member
    # shares the bench doc's shingles, so flag it pair-quadratic-
    # exempt: output stays source-sized)
    ("q178_trimmed_mean", ("lineitem",), True, False),
    ("q181_winsorized_mean", ("orders",), True, False),
    ("q182_time_weighted_avg", ("events",), True, False),
    ("q179_contamination_13gram", ("documents",), False, False),
    ("q180_rare_token_density", ("documents",), False, False),
    ("q183_effect_size", ("orders",), True, False),
    ("q184_mann_whitney", ("orders",), True, False),
    ("q185_spearman_corr", ("lineitem",), False, False),
    # round 9 back half: the separation/drift pair ride the same
    # value-domain histograms as q170 (verbatim replication keeps the
    # grid CONSTANT, only the count scan grows); kendall cells are
    # joint-value-domain-sized (constant under replication); benford
    # is a 9-row spine after one scan; the TPC-H trio are scan/join
    # families already represented but cheap to witness; autocorr's
    # daily table is date-bounded (constant rows, growing masses);
    # HHI cells are (lang x source)-sized; kcore sweeps semi-join the
    # support-capped pair table (disjoint replicated subgraphs, like
    # the communities row)
    ("q186_score_separation", ("documents",), True, False),
    ("q187_kendall_tau", ("lineitem",), True, False),
    ("q188_benford_gate", ("orders",), True, False),
    ("q189_product_profit", ("lineitem", "orders"), True, False),
    ("q190_forecast_revenue", ("lineitem",), True, False),
    ("q191_top_supplier", ("lineitem",), True, False),
    ("q192_quantile_drift", ("documents",), True, False),
    ("q193_autocorr", ("events",), True, False),
    ("q194_hhi_concentration", ("documents",), True, False),
    ("q195_kcore", ("lineitem",), False, False),
    ("q196_k_anonymity", ("customer",), True, False),
    # trend/CUSUM ride the calendar-bounded daily table (pair join /
    # windows are date-domain-sized — constant under replication;
    # only the daily reduction scan grows); power iteration is two
    # corpus matvec passes with 64-int driver state
    ("q197_robust_trend", ("events",), True, False),
    ("q198_cusum_alarm", ("events",), True, False),
    ("q199_power_iteration", ("embeddings",), True, False),
    # composition manifest: dedup-key aggregate + two free-rider
    # filters; verbatim replication makes every doc a dup clique so
    # survivors stay source-sized (sublinear by construction)
    ("q200_pipeline_manifest", ("documents",), True, False),
    # one count pass + a dozens-row grid; the sorted-fold sum is
    # cell-table-sized
    ("q201_cramers_v", ("orders",), True, False),
]


def build_scaled_dir(spark, base: str, out_dir: str, factor: int,
                     batch: int = 10) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in PASSTHROUGH:
        src, dst = f"{base}/{t}.parquet", f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(src).write.mode("overwrite").parquet(dst)
    for t, strides in SHIFTS.items():
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f"{base}/{t}.parquet")
        # write in bounded batches of copies: a single factor-way
        # union plan OOMs the writer tasks at 100x (100 concurrent
        # scans feeding wide parquet row groups)
        tmp = dst + "__building"
        first = True
        for lo in range(0, factor, batch):
            copies = []
            for k in range(lo, min(lo + batch, factor)):
                c = df
                for col, stride in strides.items():
                    c = c.withColumn(
                        col,
                        (F.col(col) + F.lit(k * stride)).cast(
                            df.schema[col].dataType
                        ),
                    )
                copies.append(c)
            u = copies[0]
            for c in copies[1:]:
                u = u.unionByName(c)
            u.write.mode("overwrite" if first else "append").parquet(tmp)
            first = False
        os.rename(tmp, dst)


def run_query(queries, spark, name: str, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = queries[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/scale_work")
    ap.add_argument("--skip-100x", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names: re-measure just these and "
        "MERGE into the round's existing artifact (same protocol) — "
        "for re-adjudicating a one-off environmental stall without "
        "a full 30-minute sweep",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    if only is not None:
        # a typo'd name would be silently skipped by the sweep loop,
        # so a re-adjudication run could no-op while still rewriting
        # the artifact — fail loudly instead
        unknown = only - {name for name, _, _, _ in SWEEP}
        if unknown:
            raise SystemExit(
                f"--only names not in SWEEP: {sorted(unknown)}"
            )

    from vnavc_spark.queries import all_queries
    from vnavc_spark.session import get_spark

    spark = get_spark(
        app_name="vnavc-scaling",
        master=f"local[{args.cpus}]",
        shuffle_partitions=int(args.cpus),
        # the 100x build/write needs more than the 1g local default
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    x10 = os.path.join(args.work, "x10")
    x100 = os.path.join(args.work, "x100")
    print("building 10x dir ...", file=sys.stderr)
    build_scaled_dir(spark, args.base, x10, 10)
    if not args.skip_100x:
        print("building 100x dir ...", file=sys.stderr)
        build_scaled_dir(spark, args.base, x100, 100)

    # pre-fork python workers + codegen warmup, same as bench.py
    queries["q01_region_revenue"](spark, args.base).count()
    # warm EVERY swept query's plan shape at sf0.001 BEFORE timing:
    # without this the base run pays one-time janino codegen
    # (~0.5-2 s) that the x10/x100 runs then skip, systematically
    # deflating every growth ratio — a genuinely superlinear query
    # could ride under the flag bar
    warm_dir = os.path.join(os.path.dirname(args.base.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name, _, _, _ in SWEEP:
            if only is not None and name not in only:
                continue
            try:
                queries[name](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass

    out: dict = {}
    for name, tables, runs_100, quad in SWEEP:
        if only is not None and name not in only:
            continue
        base_s = run_query(queries, spark, name, args.base)
        row = {"base_s": round(base_s, 3), "bound_tables": list(tables)}
        s10 = run_query(queries, spark, name, x10)
        row["x10_s"] = round(s10, 3)
        row["x10_ratio"] = round(s10 / base_s, 2)
        bar10 = 100.0 if quad else 10.0
        if quad:
            row["output_quadratic"] = True
        row["x10_superlinear"] = s10 / base_s > bar10
        if runs_100 and not args.skip_100x:
            s100 = run_query(queries, spark, name, x100)
            row["x100_s"] = round(s100, 3)
            row["x100_ratio"] = round(s100 / base_s, 2)
            row["x100_superlinear"] = s100 / base_s > (
                10000.0 if quad else 100.0
            )
        out[name] = row
        print(f"# {name}: {row}", file=sys.stderr)

    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        f"SCALING_r{args.round:02d}.json",
    )
    if only is not None and os.path.exists(dst):
        with open(dst) as fh:
            artifact = json.load(fh)
        artifact["queries"].update(out)
        artifact["remeasured"] = sorted(
            set(artifact.get("remeasured", [])) | set(out)
        )
        # the merged artifact keeps the ORIGINAL run's top-level
        # cpus/base_sf_dir — record the re-measure's environment
        # per query so a re-adjudication under a different setup is
        # visible in the artifact, not just the shell history
        env = artifact.setdefault("remeasured_env", {})
        for name in out:
            env[name] = {"cpus": int(args.cpus), "base_sf_dir": args.base}
    else:
        artifact = {
            "round": args.round,
            "generated_by": "tools/gen_scaling.py",
            "base_sf_dir": args.base,
            "cpus": int(args.cpus),
            "sink": "noop (full materialization — count() lets Catalyst"
            " prune)",
            "replication": "shifted keys; document text verbatim (dedup "
            "output grows ~factor^2 by design)",
            "queries": out,
        }
    with open(dst, "w") as fh:
        json.dump(artifact, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(dst)
    spark.stop()


if __name__ == "__main__":
    main()
