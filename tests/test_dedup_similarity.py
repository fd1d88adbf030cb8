"""Dedup + similarity invariants beyond the SQL oracles: LSH recall
vs exact, candidate⊇verified containment, simhash locality, exact
dedup keep-one semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vnavc_spark.io import table
from vnavc_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF_SMALL, "documents")


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF_SMALL, "embeddings")


class TestDedup:
    def test_exact_dedup_keeps_one_per_fingerprint(self, spark):
        rows = [(1, "Hello  WORLD!"), (2, "hello world"), (3, "khác hẳn")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        kept = dedup.drop_exact_dups(df).select("doc_id").collect()
        ids = sorted(r.doc_id for r in kept)
        # normalization equates 1 and 2 → min id kept
        assert ids == [1, 3]

    def test_minhash_candidates_superset_of_high_jaccard(self, docs):
        # every pair with jaccard ≥ 0.9 must be an LSH candidate
        # (16 hashes / 4 bands: P[miss] = (1-s^4)^4 ≈ 0.2% at s=0.9)
        verified = dedup.jaccard_pairs(docs, threshold=0.9)
        cands = dedup.minhash_candidates(docs)
        missed = verified.join(cands, on=["doc_a", "doc_b"], how="left_anti")
        assert missed.count() == 0

    def test_dedup_pipeline_equals_bounded_jaccard_on_planted_dups(self, docs):
        full = {
            (r.doc_a, r.doc_b)
            for r in dedup.jaccard_pairs(docs, threshold=0.95).collect()
        }
        piped = {
            (r.doc_a, r.doc_b)
            for r in dedup.minhash_dedup_pairs(docs, threshold=0.95).collect()
        }
        assert piped <= full
        # planted near-dups at ~0.97+ jaccard: expect full recall here
        assert piped == full

    def test_simhash_locality(self, spark):
        a = "spark window batch query the fast table row value part"
        b = "spark window batch query the fast table row value parts"  # 1 token
        c = "completely different words entirely other content here now"
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, c)], ["doc_id", "text"]
        )
        sh = {r.doc_id: r.sh for r in df.select("doc_id", dedup.simhash32("text").alias("sh")).collect()}
        ham = lambda x, y: bin(x ^ y).count("1")
        assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])

    def test_shingles_expression_matches_python(self, spark, docs):
        expr = docs.limit(50).select(
            "doc_id", dedup.word_shingles("text").alias("sh")
        ).collect()
        for r in expr:
            py = dedup._py_shingles(
                docs.filter(F.col("doc_id") == r.doc_id).first().text
            )
            assert sorted(r.sh) == sorted(py)


class TestSimilarity:
    def test_lsh_recall_vs_exact(self, emb):
        queries = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.cosine_topk(emb, queries, k=10).collect()
        }
        # sf0.001 has only ~50 vectors: use 4-bit buckets (16) so
        # buckets aren't singletons; production sizes bits to corpus
        approx = {
            (r.query_id, r.neighbor_id)
            for r in similarity.lsh_topk(emb, queries, k=10, bits=4).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5

    def test_ivf_recall_and_determinism(self, emb):
        queries = emb.filter(F.col("vec_id") < 5)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.cosine_topk(emb, queries, k=10).collect()
        }
        ivf1 = similarity.ivf_topk(
            emb, queries, k=10, n_cells=8, nprobe=3
        ).collect()
        got = {(r.query_id, r.neighbor_id) for r in ivf1}
        assert len(exact & got) / len(exact) >= 0.5
        # hash-seeded centroids → bit-stable across runs
        ivf2 = similarity.ivf_topk(
            emb, queries, k=10, n_cells=8, nprobe=3
        ).collect()
        assert sorted(map(tuple, ivf1)) == sorted(map(tuple, ivf2))

    def test_ivf_full_probe_equals_exact(self, emb):
        # probing ALL cells must recover the exact result
        queries = emb.filter(F.col("vec_id") < 3)
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.cosine_topk(emb, queries, k=5).collect()
        }
        full = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivf_topk(
                emb, queries, k=5, n_cells=4, nprobe=4
            ).collect()
        }
        assert full == exact

    def test_cosine_topk_scores_sane(self, emb):
        out = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=5)
        rows = out.collect()
        assert all(-1.0 <= r.score <= 1.0 for r in rows)
        # ranks are 1..5 per query
        for q in {r.query_id for r in rows}:
            assert sorted(r.rank for r in rows if r.query_id == q) == [1, 2, 3, 4, 5]


class TestEmbeddingNeardupLsh:
    def test_subset_of_bruteforce_with_recall(self, spark, emb):
        from vnavc_spark.functions.vector import cosine
        from vnavc_spark.functions.portable import stable_round

        a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
        brute = {
            (r.vec_a, r.vec_b)
            for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
            .select(
                "vec_a", "vec_b",
                stable_round(cosine("ea", "eb"), 6).alias("score"),
            )
            .filter(F.col("score") >= 0.4)
            .collect()
        }
        lsh = {
            (r.vec_a, r.vec_b)
            for r in similarity.embedding_neardup_lsh(
                emb, threshold=0.4, bits=4
            ).collect()
        }
        assert lsh <= brute  # no false positives (exact rerank)
        if brute:
            assert len(lsh) / len(brute) >= 0.3  # LSH recall floor


class TestVectorizedCosine:
    def test_matches_hof_path(self, spark, emb):
        queries = emb.filter(F.col("vec_id") < 5)
        hof = similarity.cosine_topk(emb, queries, k=10).collect()
        vec = similarity.cosine_topk_vectorized(emb, queries, k=10).collect()
        h = {(r.query_id, r.neighbor_id): r.score for r in hof}
        v = {(r.query_id, r.neighbor_id): r.score for r in vec}
        # identical neighbor sets; scores equal to 1e-6 (summation
        # order differs between BLAS and the sequential fold)
        assert set(h) == set(v)
        for kk in h:
            assert abs(h[kk] - v[kk]) <= 1e-6
