"""Alignment + QC stage tests (A6 seam, F7, O4, G6/G11, A9, F9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vnavc_spark.pipeline import alignment as AL
from vnavc_spark.pipeline import qc as QC


@pytest.fixture(scope="module")
def groups(spark):
    rows = [
        ("b1", 0, "một câu dài " * 3),
        ("b1", 1, "câu thứ hai"),
        ("b1", 2, "x" * 200),  # long → long segment → outlier at 3-12s
        ("b2", 0, "sách hai chỉ có một nhóm"),
    ]
    return spark.createDataFrame(rows, ["book_id", "group_id", "text"])


@pytest.fixture(scope="module")
def book_audio(spark):
    return spark.createDataFrame(
        [("b1", 30.0), ("b2", 8.0)], ["book_id", "duration"]
    )


class TestAlign:
    def test_proportional_fake_covers_duration(self, spark, groups, book_audio):
        segs = AL.align_books(groups, book_audio).orderBy("book_id", "seg_id")
        rows = segs.collect()
        b1 = [r for r in rows if r.book_id == "b1"]
        # O4: contiguous 0-based ids, monotone non-overlapping spans
        assert [r.seg_id for r in b1] == [0, 1, 2]
        assert b1[0].start == 0.0
        for a, b in zip(b1, b1[1:]):
            assert b.start == pytest.approx(a.end)
        assert b1[-1].end == pytest.approx(30.0)
        # proportionality: longest text gets the longest span
        longest = max(b1, key=lambda r: len(r.text))
        assert longest.duration == max(r.duration for r in b1)

    def test_outlier_flag_and_utterances(self, spark, groups, book_audio):
        segs = AL.segments_with_outliers(
            AL.align_books(groups, book_audio), lo=3.0, hi=12.0
        )
        flags = {(r.book_id, r.seg_id): r.is_outlier for r in segs.collect()}
        assert flags[("b1", 2)] is True  # 200-char segment dominates 30 s
        books = spark.createDataFrame(
            [("b1", [{"id": "spk1", "name": "N"}]), ("b2", None)],
            "book_id string, narrator array<struct<id:string,name:string>>",
        )
        utts = AL.utterance_table(segs, books)
        rows = utts.collect()
        assert all(not hasattr(r, "is_outlier") for r in rows)
        spk = {r.book_id: r.speaker_id for r in rows}
        assert spk["b1"] == "spk1" and spk["b2"] == "unknown"


class TestQc:
    def test_word_edit_distance(self):
        assert QC.word_edit_distance("a b c", "a b c") == 0
        assert QC.word_edit_distance("a b c", "a x c") == 1
        assert QC.word_edit_distance("a b c", "b c") == 1
        assert QC.word_edit_distance("", "a b") == 2
        assert QC.word_edit_distance("a b", "") == 2

    @pytest.fixture(scope="class")
    def utterances(self, spark):
        # b_good: perfect transcripts; b_bad: every word wrong
        rows = []
        for i in range(40):
            rows.append(("b_good", i, f"xin chào bạn số {i}"))
            rows.append(("b_bad", i, f"xin chào bạn số {i}"))
        return spark.createDataFrame(rows, ["book_id", "seg_id", "text"])

    def test_sample_exact_k(self, utterances):
        s = QC.sample_for_qc(utterances, pct=0.05)
        counts = {r.book_id: r.n for r in s.groupBy("book_id").agg(F.count("*").alias("n")).collect()}
        assert counts == {"b_good": 2, "b_bad": 2}  # ceil(40*0.05)=2
        # deterministic
        a = sorted(tuple(r) for r in s.collect())
        b = sorted(tuple(r) for r in QC.sample_for_qc(utterances, pct=0.05).collect())
        assert a == b

    def test_wer_gate(self, spark, utterances):
        sampled = QC.sample_for_qc(utterances, pct=0.1)
        hyps = sampled.select(
            "book_id",
            "seg_id",
            F.when(
                F.col("book_id") == "b_bad", F.lit("hoàn toàn sai hết rồi")
            ).otherwise(F.col("text")).alias("hypothesis"),
        )
        scored = QC.score_transcripts(sampled, hyps)
        books = spark.createDataFrame([("b_good",), ("b_bad",)], ["book_id"])
        book_wer, kept = QC.qc_gate(scored, books, threshold_pct=50.0)
        wer = {r.book_id: r.wer_pct for r in book_wer.collect()}
        assert wer["b_good"] == 0.0
        assert wer["b_bad"] >= 50.0
        assert [r.book_id for r in kept.collect()] == ["b_good"]


class TestWerDenominator:
    def test_ref_words_counts_normalized_tokens(self, spark):
        # '123' expands to 'một hai ba' (3 tokens): the denominator
        # must count NORMALIZED tokens — the same stream the edit
        # distance runs over — or number-heavy books get WER > 100%
        sampled = spark.createDataFrame(
            [("b1", 1, "đoạn 123 xong")], ["book_id", "seg_id", "text"]
        )
        hyps = spark.createDataFrame(
            [("b1", 1, "đoạn một hai ba xong")],
            ["book_id", "seg_id", "hypothesis"],
        )
        row = QC.score_transcripts(sampled, hyps).first()
        # normalized ref = 'đoạn một hai ba xong' -> 5 tokens, 0 errors
        assert row.ref_words == 5
        assert row.word_errors == 0

    def test_perfect_asr_on_numbers_gives_zero_wer(self, spark):
        sampled = spark.createDataFrame(
            [("b1", i, f"chương {i} có 45 trang") for i in range(3)],
            ["book_id", "seg_id", "text"],
        )
        hyps = spark.createDataFrame(
            [
                ("b1", i, f"chương {QC.process_transcript(str(i))} có bốn năm trang")
                for i in range(3)
            ],
            ["book_id", "seg_id", "hypothesis"],
        )
        scored = QC.score_transcripts(sampled, hyps)
        wer = QC.weighted_wer(scored, group="book_id").first()
        assert wer.wer_pct == 0.0
