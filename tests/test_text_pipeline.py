"""Text pipeline stage tests (T4/T6/F6/G10) — hermetic, small books."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vnavc_spark.pipeline.text_pipeline import (
    group_sentences,
    group_sentences_df,
    process_text_stage,
    tokenize_sentences,
)


class TestGroupSentences:
    def test_reference_fold_semantics(self):
        # threshold 10: flush when running count + next >= threshold
        sents = ["a b c", "d e f g", "h i j k l m n o", "p q"]
        out = group_sentences(sents, threshold=10)
        # 3 + 4 = 7 < 10 → acc; +8 >= 10 → flush all three joined
        assert out[0] == "a b c d e f g h i j k l m n o"
        # trailing "p q" = 2 words < 10//2 → dropped
        assert len(out) == 1

    def test_single_long_sentence_flushes_alone(self):
        out = group_sentences(["w " * 25], threshold=20)
        assert len(out) == 1

    def test_trailing_kept_at_half_threshold(self):
        out = group_sentences(["a b c d e", "f g h i j"], threshold=100)
        # 10 words total < 100 but ≥ 50? no → dropped
        assert out == []
        out = group_sentences(["a b c d e", "f g h i j"], threshold=20)
        # 10 words < 20, trailing 10 ≥ 10 → kept
        assert out == ["a b c d e f g h i j"]

    def test_empty(self):
        assert group_sentences([], 20) == []

    def test_concatenation_preserves_tokens(self):
        # property: grouped output is a token-order-preserving prefix
        sents = [f"w{i} w{i} w{i}" for i in range(10)]
        out = group_sentences(sents, threshold=7)
        all_out = " ".join(out).split()
        all_in = " ".join(sents).split()
        assert all_out == all_in[: len(all_out)]


class TestTokenize:
    def test_fallback_splits_on_terminals(self):
        out = tokenize_sentences("Câu một. Câu hai! Câu ba?")
        assert out == ["Câu một.", "Câu hai!", "Câu ba?"]

    def test_empty(self):
        assert tokenize_sentences(None) == []
        assert tokenize_sentences("") == []


class TestStage:
    @pytest.fixture(scope="class")
    def books(self, spark):
        rows = [
            (
                "b1",
                "Đây là câu thứ nhất rất dài và đầy đủ nội dung hay. "
                "Câu hai ngắn hơn một chút thôi nhé bạn ơi nha. "
                "Câu ba có số 123 và ngày 12/01/2023 ở đây nhé. "
                "Ngắn quá.",
            ),
            ("b2", "Một câu duy nhất nhưng mà nó đủ dài để thành nhóm riêng."),
        ]
        return spark.createDataFrame(rows, ["book_id", "raw_text"])

    def test_end_to_end(self, spark, books):
        sents, groups, metrics = process_text_stage(books, threshold=15)
        s = sents.orderBy("book_id", "line_no").collect()
        # F6: "Ngắn quá." (2 words) dropped
        assert all(r.n_words >= 3 for r in s)
        # T3 applied: digits → words
        b1 = [r.norm for r in s if r.book_id == "b1"]
        assert any("một hai ba" in t for t in b1)
        assert any("ngày một hai tháng một năm" in t for t in b1)
        g = groups.collect()
        assert {r.book_id for r in g} <= {"b1", "b2"}
        m = {r.book_id: r for r in metrics.collect()}
        assert m["b1"].num_sentences == len(b1)
        assert m["b1"].word_count == sum(r.n_words for r in s if r.book_id == "b1")

    def test_group_determinism_under_shuffle(self, spark, books):
        sents, _, _ = process_text_stage(books, threshold=15)
        g1 = group_sentences_df(sents, threshold=15).orderBy("book_id", "group_id")
        g2 = group_sentences_df(
            sents.repartition(7).sortWithinPartitions(F.desc("line_no")),
            threshold=15,
        ).orderBy("book_id", "group_id")
        assert [tuple(r) for r in g1.collect()] == [tuple(r) for r in g2.collect()]

    def test_fold_paths_agree(self, spark, books):
        # mapInPandas batch fold ≡ per-group applyInPandas
        sents, _, _ = process_text_stage(books, threshold=15)
        fast = group_sentences_df(sents, threshold=15).orderBy(
            "book_id", "group_id"
        )
        ref = group_sentences_df(
            sents, threshold=15, per_group_udf=True
        ).orderBy("book_id", "group_id")
        assert [tuple(r) for r in fast.collect()] == [
            tuple(r) for r in ref.collect()
        ]

    def test_fold_carries_across_arrow_batches(self, spark):
        # one big book whose rows span many tiny Arrow batches: the
        # cross-batch carry must not split the fold
        rows = [("b1", i, f"w{i} w{i} w{i}") for i in range(500)]
        df = spark.createDataFrame(rows, ["book_id", "line_no", "norm"])
        small_batches = spark.conf.get(
            "spark.sql.execution.arrow.maxRecordsPerBatch"
        )
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        try:
            fast = group_sentences_df(df, threshold=10).collect()
            ref = group_sentences_df(df, threshold=10, per_group_udf=True).collect()
            assert sorted(map(tuple, fast)) == sorted(map(tuple, ref))
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", small_batches
            )


class TestRejectedRows:
    def test_rejected_table_accounts_for_all_rows(self, spark):
        rows = [("b", 0, "một câu đủ dài để giữ lại nhé"), ("b", 1, "ngắn quá"),
                ("b", 2, "...")]
        df = spark.createDataFrame(rows, ["book_id", "line_no", "raw"])
        from vnavc_spark.pipeline.text_pipeline import normalize_sentences

        kept, rejected = normalize_sentences(df, with_rejected=True)
        assert kept.count() + rejected.count() == 3
        reasons = {r.line_no: r.reject_reason for r in rejected.collect()}
        assert reasons[1] == "fewer_than_3_words"
        assert reasons[2] == "empty_after_normalize"


class TestFusedSentences:
    def test_fused_equals_unfused(self, spark):
        from vnavc_spark.pipeline.text_pipeline import (
            explode_sentences,
            normalize_sentences,
            sentences_from_books,
        )

        rows = [
            ("b1", "Câu một đủ dài rồi nhé. Ngắn. Câu 123 ngày 1/2/2023 nhé."),
            ("b2", "Một quyển khác với một câu duy nhất thôi."),
        ]
        books = spark.createDataFrame(rows, ["book_id", "raw_text"])
        fused = sentences_from_books(books).orderBy("book_id", "line_no")
        unfused = normalize_sentences(explode_sentences(books)).orderBy(
            "book_id", "line_no"
        )
        assert [tuple(r) for r in fused.collect()] == [
            tuple(r) for r in unfused.collect()
        ]
