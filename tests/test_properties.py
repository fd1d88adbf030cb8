"""Property-based tests (SURVEY §5: duration parser on random H:M:S,
grouping invariants, WER metric properties, engine-portable float
aggregation on random doubles)."""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vnavc_spark.functions.portable import exact_sum
from vnavc_spark.functions.text import convert_duration
from vnavc_spark.operators.sampling import exact_k_per_group
from vnavc_spark.pipeline.qc import word_edit_distance
from vnavc_spark.pipeline.text_pipeline import group_sentences
from vnavc_spark.pipeline.vietnamese import digits_to_words

# ---------------------------------------------------------------------------
# pure-Python properties (hypothesis)
# ---------------------------------------------------------------------------

words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=8
).map(" ".join)


class TestGroupingProperties:
    @given(st.lists(words, max_size=30), st.integers(2, 40))
    @settings(max_examples=200, deadline=None)
    def test_invariants(self, sents, threshold):
        out = group_sentences(sents, threshold)
        # 1. token stream is a prefix of the input token stream
        out_toks = " ".join(out).split()
        in_toks = " ".join(sents).split()
        assert out_toks == in_toks[: len(out_toks)]
        # 2. every group meets the minimum: ≥ threshold words, except
        #    a possibly-smaller FINAL group that still has ≥ threshold//2
        sizes = [len(g.split()) for g in out]
        for s in sizes[:-1]:
            assert s >= threshold  # every flushed (non-final) group
        if sizes:
            assert sizes[-1] >= threshold // 2  # trailing group rule

    @given(st.lists(words, max_size=20), st.integers(2, 30))
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, sents, threshold):
        assert group_sentences(sents, threshold) == group_sentences(
            sents, threshold
        )


class TestWerProperties:
    @given(words, words)
    @settings(max_examples=200, deadline=None)
    def test_metric_axioms(self, a, b):
        d = word_edit_distance(a, b)
        assert d == word_edit_distance(b, a)  # symmetry
        assert (d == 0) == (a.split() == b.split())  # identity
        assert d <= max(len(a.split()), len(b.split()))  # bound

    @given(words, words, words)
    @settings(max_examples=100, deadline=None)
    def test_triangle_inequality(self, a, b, c):
        assert word_edit_distance(a, c) <= word_edit_distance(
            a, b
        ) + word_edit_distance(b, c)


class TestDigitWords:
    @given(st.integers(0, 10**9))
    @settings(max_examples=200, deadline=None)
    def test_digitwise(self, n):
        out = digits_to_words(n)
        if n < 10:
            assert " " not in out
        else:
            assert len(out.split()) == len(str(n))


# ---------------------------------------------------------------------------
# Spark batch properties (seeded random corpora, one job per test)
# ---------------------------------------------------------------------------

class TestDurationParserBatch:
    def test_random_hms_roundtrip(self, spark):
        rng = random.Random(42)
        cases = []
        for _ in range(300):
            h, m, s = rng.randint(0, 99), rng.randint(0, 59), rng.randint(0, 59)
            sep = rng.choice([":", ";"])
            cases.append((f"{h:02d}{sep}{m:02d}:{s:02d}", h * 3600 + m * 60 + s))
        for _ in range(50):  # garbage -> NULL; tolerant forms -> value
            raw = rng.choice(["x:y", "1", "::", "1:2:3:4", "", "a:1:2"])
            expected = {"1": 1, "::": 0, "1:2:3:4": ((60 + 2) * 60 + 3) * 60 + 4,
                        "": 0}.get(raw)
            cases.append((raw, expected))
        df = spark.createDataFrame(cases, "raw string, expected long")
        out = df.withColumn(
            "got", convert_duration(F.col("raw"), "seconds")
        ).collect()
        for r in out:
            if r.expected is None:
                assert r.got is None, r.raw
            else:
                assert r.got == pytest.approx(float(r.expected)), r.raw


class TestPortableAggregation:
    def test_exact_sum_matches_duckdb_on_random_doubles(self, spark):
        rng = random.Random(7)
        vals = [rng.uniform(-1e6, 1e6) for _ in range(5000)]
        got = (
            spark.createDataFrame([(v,) for v in vals], "v double")
            .repartition(13)  # scramble aggregation order
            .agg(exact_sum(F.col("v"), 2).alias("s"))
            .first()["s"]
        )
        want = duckdb.connect().execute(
            "SELECT sum(floor(v * 100.0 + 0.5)) / 100.0 FROM (SELECT unnest(?) AS v)",
            [vals],
        ).fetchone()[0]
        assert got == want  # bit-identical, any partitioning


class TestSamplingProperties:
    def test_exact_k_formula_random_group_sizes(self, spark):
        rng = random.Random(3)
        rows = []
        sizes = {f"g{i}": rng.randint(1, 40) for i in range(25)}
        for g, n in sizes.items():
            rows += [(g, j) for j in range(n)]
        df = spark.createDataFrame(rows, "grp string, k long")
        out = (
            exact_k_per_group(df, group="grp", key="k", pct=0.07)
            .groupBy("grp")
            .count()
            .collect()
        )
        got = {r.grp: r["count"] for r in out}
        assert got == {
            g: max(1, math.ceil(n * 0.07)) for g, n in sizes.items()
        }


class TestAsofJoinProperty:
    def test_random_asof_matches_naive(self, spark):
        from vnavc_spark.operators.joins import asof_join

        rng = random.Random(11)
        left = [(f"u{rng.randint(0, 5)}", i, rng.randint(0, 200)) for i in range(300)]
        right_raw = {
            (f"u{rng.randint(0, 5)}", rng.randint(0, 200)): rng.randint(0, 999)
            for _ in range(120)
        }
        right = [(k, t, v) for (k, t), v in right_raw.items()]
        ldf = spark.createDataFrame(left, ["k", "lid", "t"])
        rdf = spark.createDataFrame(right, ["k", "t", "v"])
        got = {
            r.lid: r.asof_v
            for r in asof_join(ldf, rdf, on="k", ts_col="t").collect()
        }
        for k, lid, t in left:
            cands = [(rt, v) for (rk, rt), v in right_raw.items() if rk == k and rt <= t]
            expect = max(cands)[1] if cands else None
            assert got[lid] == expect, (k, lid, t)


class TestAnalyticsBruteForce:
    """Seeded randomized cross-checks of the round-4 distributed
    algorithms against O(n^2)/O(n^3) reference implementations."""

    def test_triangle_count_matches_brute_force(self, spark):
        import itertools
        import random as rnd

        from vnavc_spark.operators.graph import triangle_stats

        rng = rnd.Random(42)
        for trial in range(3):
            n = 18
            edges = sorted(
                {
                    (a, b)
                    for a in range(1, n + 1)
                    for b in range(a + 1, n + 1)
                    if rng.random() < 0.25
                }
            )
            es = set(edges)
            expect = sum(
                1
                for a, b, c in itertools.combinations(range(1, n + 1), 3)
                if (a, b) in es and (b, c) in es and (a, c) in es
            )
            df = spark.createDataFrame(edges, "a long, b long")
            got = triangle_stats(df).collect()[0]["n_triangles"]
            assert got == expect, f"trial {trial}: {got} != {expect}"

    def test_concurrency_matches_brute_force(self, spark):
        import datetime
        import random as rnd

        from vnavc_spark.operators.intervals import max_concurrency_by_day

        rng = rnd.Random(7)
        base = datetime.datetime(2024, 3, 1)
        ivs = []
        for _ in range(60):
            s = base + datetime.timedelta(minutes=rng.randrange(0, 3 * 1440))
            e = s + datetime.timedelta(minutes=rng.randrange(1, 900))
            ivs.append((s, e))
        df = spark.createDataFrame(ivs, "s_start timestamp, s_end timestamp")
        got = {
            r["day"]: r["max_concurrent"]
            for r in max_concurrency_by_day(df).collect()
        }
        # brute force: sweep the union of endpoints per day (closed
        # intervals; concurrency at instant t = #{i : s <= t <= e})
        days = sorted(
            {
                (s + datetime.timedelta(days=k)).date()
                for s, e in ivs
                for k in range((e.date() - s.date()).days + 1)
            }
        )
        for day in days:
            d0 = datetime.datetime.combine(day, datetime.time())
            d1 = d0 + datetime.timedelta(days=1)
            probes = {max(s, d0) for s, e in ivs if s < d1 and e >= d0}
            expect = max(
                sum(1 for s, e in ivs if s <= t <= e) for t in probes
            )
            assert got[str(day)] == expect, (day, got[str(day)], expect)

    def test_pps_matches_single_threaded_reference(self, spark):
        import hashlib
        import random as rnd

        from vnavc_spark.operators.sampling import pps_systematic

        rng = rnd.Random(3)
        rows = [(i, rng.randrange(1, 40)) for i in range(300)]
        k = 17
        df = spark.createDataFrame(rows, "id long, w long")
        got = {
            r["id"]: r["mult"]
            for r in pps_systematic(df, "id", "w", k=k).collect()
        }
        # reference: same md5 order, single cumulative pass
        order = sorted(
            rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
        )
        tot = sum(w for _, w in rows)
        cum, expect = 0, {}
        for i, w in order:
            lo, cum = cum, cum + w
            m = (cum * k) // tot - (lo * k) // tot
            if m > 0:
                expect[i] = m
        assert got == expect


class TestWeightedQuantileReference:
    """Randomized cross-check of weighted_quantile_select against a
    single-threaded sorted-cumulative reference — guards the
    narrowing machinery's weighted rank arithmetic on skewed and
    duplicate-heavy distributions (the ADVICE-bug neighborhood)."""

    def test_random_weighted_quantiles_match_reference(self, spark):
        import random as rnd

        from vnavc_spark.operators.aggregates import (
            weighted_quantile_select,
        )

        rng = rnd.Random(11)
        for trial, (qn, qd) in enumerate([(1, 2), (9, 10), (1, 4)]):
            rows = []
            for g in ("a", "b"):
                for _ in range(150):
                    # heavy duplicate mass + occasional extreme
                    v = rng.choice([1.0, 2.0, 2.0, 3.0, 50.0])
                    w = float(rng.randrange(1, 6))
                    rows.append((g, v, w))
            # mass concentrated at the maximum (the fixed floor-width
            # stall case)
            rows += [("c", 0.0, 1.0)] * 10 + [("c", 100.01, 1.0)] * 50
            df = spark.createDataFrame(rows, "g string, v double, w double")
            got = {
                r["g"]: r["qvalue"]
                for r in weighted_quantile_select(
                    df, ["g"], "v", "w", q_num=qn, q_den=qd,
                    places=2, weight_places=0,
                ).collect()
            }
            # reference: sort by value, walk cumulative integer mass
            from collections import defaultdict

            by_g = defaultdict(list)
            for g, v, w in rows:
                by_g[g].append((round(v * 100), int(w)))
            for g, vals in by_g.items():
                vals.sort()
                tot = sum(w for _, w in vals)
                rank = (qn * tot + qd - 1) // qd
                cum = 0
                for vc, w in vals:
                    cum += w
                    if cum >= rank:
                        assert got[g] == vc / 100.0, (trial, g, got[g], vc)
                        break
