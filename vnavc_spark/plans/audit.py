"""Physical-plan audit: assert the plan properties that matter at
100 TB — filters pushed to the parquet scan, columns pruned, small
dims broadcast, whole-stage codegen present, no cartesian products
where an equi-join was intended.

Used by tests/test_plans.py to keep every headline query's plan
honest as the code evolves; ``audit_report`` is also a debugging aid
(`python -m vnavc_spark.plans.audit` prints the audit for all bench
queries).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanFacts:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    shuffled_hash_joins: int = 0
    nested_loop_joins: int = 0
    exchanges: int = 0
    codegen_stages: int = 0
    take_ordered: bool = False
    python_nodes: int = 0
    parquet_scans: int = 0
    in_memory_scans: int = 0
    # Window nodes with NO partition spec — each one funnels its
    # whole input through a single task's sort (or a single
    # partition, for the unordered whole-frame form). Acceptable
    # ONLY over bounded-by-construction inputs (a ≤64-row band-carry
    # table) or when WindowGroupLimit pushes a rank<=k limit into
    # the sort; a global window over a corpus-derived table is the
    # canonical 100 TB scale killer (round-5 verdict: q114).
    global_windows: int = 0
    window_group_limits: int = 0


def _window_spec_args(line: str) -> list[str] | None:
    """Top-level args of the first ``windowspecdefinition(...)`` on a
    simple-plan Window line, or None when the line is not a Window
    node. Partition columns print WITHOUT a sort-direction marker,
    order columns WITH one, and the frame is the trailing
    ``specifiedwindowframe(...)`` arg."""
    if "WindowGroupLimit" in line or not re.search(r"\bWindow\s+\[", line):
        return None
    m = re.search(r"windowspecdefinition\(", line)
    if m is None:
        return None
    args, depth, cur = [], 0, []
    for ch in line[m.end():]:
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                break
            depth -= 1
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    if cur:
        args.append("".join(cur).strip())
    return args


def window_partition_specs(df: DataFrame) -> list[list[str]]:
    """Per unique Window node in the simple plan, the PARTITION BY
    column expressions (order columns and the frame stripped; expr
    ids normalized). Lets tests pin that a window's partitioning
    includes a corpus-cardinality key — e.g. q126/q138's tie-rank
    windows must partition by the VALUE column, never by the
    dimension key alone (the ≤25-task sort the round-6 verdict
    flagged)."""
    simple = explain_string(df, "simple")
    specs = {}
    for line in simple.splitlines():
        args = _window_spec_args(line)
        if args is None:
            continue
        part = [
            re.sub(r"#\d+L?", "", a)
            for a in args
            if not a.startswith("specifiedwindowframe")
            and " ASC " not in a
            and " DESC " not in a
        ]
        key = re.sub(r"#\d+L?", "#x", line[line.index("Window"):])
        specs[key] = part
    return list(specs.values())


def _is_global_window(line: str) -> bool:
    """True when a simple-plan line is a Window node with no
    partition spec. The discriminator lives inside
    ``windowspecdefinition(part..., order ASC/DESC..., frame)``:
    partition columns print WITHOUT a sort-direction marker, order
    columns WITH one, and the frame is the trailing
    ``specifiedwindowframe(...)`` arg — so the spec is global iff
    every arg before the frame carries ASC/DESC (or there are none).
    Counting trailing bracket groups is NOT reliable: a partitioned
    window with no orderBy prints only two groups, same as a global
    ordered one."""
    args = _window_spec_args(line)
    if args is None:
        return False
    pre_frame = [a for a in args if not a.startswith("specifiedwindowframe")]
    return all(" ASC " in a or " DESC " in a for a in pre_frame)


def plan_facts(df: DataFrame, executed: bool = False) -> PlanFacts:
    # formatted mode for scan details; simple mode for node counts
    # (formatted lists every node twice — tree + details section) and
    # for codegen stage ids, which appear as `*(n)` markers there.
    # With AQE on, codegen staging only exists in the FINAL adaptive
    # plan — pass executed=True to run THIS dataset's QueryExecution
    # (collect; a write would build a fresh one) and audit what
    # actually executed. Use on small inputs only.
    if executed:
        df.collect()
    fmt = explain_string(df, "formatted")
    simple = explain_string(df, "simple")
    f = PlanFacts()
    f.pushed_filters = [
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", fmt) if m.strip()
    ]
    f.read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", fmt)
    f.broadcast_joins = len(re.findall(r"BroadcastHashJoin", simple))
    f.sortmerge_joins = len(re.findall(r"SortMergeJoin", simple))
    f.shuffled_hash_joins = len(re.findall(r"ShuffledHashJoin", simple))
    f.nested_loop_joins = len(
        re.findall(r"BroadcastNestedLoopJoin|CartesianProduct", simple)
    )
    f.exchanges = len(re.findall(r"Exchange (?:hash|range|Single|rebalance)", simple))
    f.codegen_stages = len(set(re.findall(r"\*\((\d+)\)", simple)))
    # with AQE on, pre-execution simple plans carry no `*(n)` markers;
    # "codegen" mode compiles and reports subtree count directly
    if f.codegen_stages == 0:
        m = re.search(
            r"Found (\d+) WholeStageCodegen subtrees",
            explain_string(df, "codegen"),
        )
        if m:
            f.codegen_stages = int(m.group(1))
    f.take_ordered = "TakeOrderedAndProject" in simple
    # lineage re-scan detector: a query over T tables whose plan holds
    # many more than T parquet scans is replaying a shared subtree per
    # consumer — persist the small intermediate (see cache.py; the
    # unpersisted q116/q118 plans each held 12 scans). InMemoryTableScan
    # nodes print their (not-yet-materialized) lineage too, so count
    # them to contextualize: scans INSIDE a cached subtree run once.
    f.parquet_scans = len(re.findall(r"Scan parquet", simple))
    f.in_memory_scans = len(re.findall(r"InMemoryTableScan", simple))
    # count UNIQUE global windows (expr ids stripped): a persisted
    # subtree's lineage reprints under every InMemoryTableScan, so a
    # raw line count would report one window ten times (q33)
    f.global_windows = len(
        {
            re.sub(r"#\d+L?", "#x", line[line.index("Window") :])
            for line in simple.splitlines()
            if _is_global_window(line)
        }
    )
    f.window_group_limits = len(re.findall(r"WindowGroupLimit", simple))
    f.python_nodes = len(
        re.findall(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|BatchEvalPython",
            simple,
        )
    )
    return f


# Queries allowed a nonzero unpartitioned-Window count, each bounded
# by construction (tests/test_plans.py asserts the whole registry
# against this; anything absent must audit at ZERO global windows —
# the q114 round-5 scale-killer regression net, registry-wide):
#   q105  2 — rank/total over the SOURCE-cardinality aggregate
#             (~20 rows at any corpus size)
#   q114  2 — ranked_mass_cumsum's ≤~64-row log2-band carry + total
#             (plan-pinned in TestGlobalWindowPins)
#   q132  1 — pps_systematic's 256-row bucket carry
#   q17   1 — intentionally global sequential chunk ids (documented
#             single-sequence contract)
#   q57   1 — vocab rank window fed by TakeOrderedAndProject (the
#             rank limit is pushed; the window sees ≤ k rows)
#   q67   1 — same TakeOrdered-bounded rank window on merge pairs
GLOBAL_WINDOW_ALLOWLIST: dict[str, int] = {
    "q105_gini_balance": 2,
    "q114_nucleus_vocab": 2,
    "q132_pps_sample": 1,
    "q17_chunk_ids": 1,
    "q57_vocabulary": 1,
    "q67_bpe_merge_pairs": 1,
    # two ungrouped ordered_cumsum passes over the day-bounded
    # duration grid (n-at-risk, then quantized hazard terms): each
    # global window is the cumsum's carry over <= num_parts
    # partition-total rows — bounded by CLUSTER CONFIG, not data
    # (the documented ungrouped-ordered_cumsum class)
    "q220_churn_hazard": 2,
    # same hazard core, minute-bounded session-duration grid (the
    # sessionization windows are user_id-partitioned, not global)
    "q223_session_survival": 2,
}


def audit_report(
    spark, sf_dir: str, names: list[str] | None = None, isolate: bool = True
) -> dict:
    """Per-query plan facts. ``isolate`` (default) clears tracked
    persists + the Spark cache before EVERY query: a warm cache
    rewrites later queries' explain output (InMemoryTableScan either
    hides a cached subtree's windows or reprints them once per
    consumer), so shared-session facts depend on execution history —
    the round-6 verdict's q33/q110 phantom global-window counts.
    Isolated facts are deterministic and match the standalone plan."""
    from vnavc_spark.queries import all_queries

    qs = all_queries()
    names = names or sorted(qs)
    out = {}
    for name in names:
        try:
            if isolate:
                from vnavc_spark.cache import clear_tracked

                clear_tracked()
                spark.catalog.clearCache()
            out[name] = plan_facts(qs[name](spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            out[name] = f"ERROR: {e}"
    return out


def scale_facts(spark, sf_dir: str, names: list[str] | None = None) -> dict:
    """JSON-serializable plan-fact snapshot for round-stamped scale
    artifacts (docs/SCALE_FACTS_r{N}.json): the measured numbers the
    100 TB claims in docs/SCALE.md cite, re-generated per round so
    the claims stay tied to the code as it evolves."""
    from dataclasses import asdict

    out = {}
    for name, facts in audit_report(spark, sf_dir, names).items():
        if isinstance(facts, PlanFacts):
            d = asdict(facts)
            d["n_pushed_filters"] = len(d.pop("pushed_filters"))
            d["n_scans"] = len(d.pop("read_schemas"))
            out[name] = d
        else:
            out[name] = {"error": str(facts)}
    return out


if __name__ == "__main__":
    import json as _json
    import sys as _sys

    from vnavc_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    if "--json" in _sys.argv:
        path = _sys.argv[_sys.argv.index("--json") + 1]
        facts = scale_facts(spark, "/root/testdata/sf0.001")
        with open(path, "w") as fh:
            _json.dump(facts, fh, indent=1, sort_keys=True)
        print(f"wrote {path} ({len(facts)} queries)")
    else:
        for name, facts in audit_report(
            spark, "/root/testdata/sf0.001"
        ).items():
            print(f"== {name}\n   {facts}")
