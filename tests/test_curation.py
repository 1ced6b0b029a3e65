"""Unit tests for kgx.curation (training-data curation operators)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kgx import curation


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


class TestContamination:
    def test_flags_overlapping_doc(self, spark):
        bench = _docs(spark, [(100, "a b c d e f g h i j", "en", "s")])
        corpus = _docs(
            spark,
            [
                # shares the benchmark's 8-gram windows
                (1, "a b c d e f g h i j", "en", "s"),
                # disjoint vocabulary -> zero overlap
                (2, "q r s t u v w x y z", "en", "s"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in curation.contamination_flags(corpus, bench, n=8, threshold=0.1)
            .collect()
        }
        assert out[1]["contaminated"] and out[1]["n_overlap"] == out[1]["n_shingles"]
        assert not out[2]["contaminated"] and out[2]["n_overlap"] == 0

    def test_short_doc_whole_text_shingle(self, spark):
        bench = _docs(spark, [(100, "tiny doc", "en", "s")])
        corpus = _docs(
            spark, [(1, "tiny doc", "en", "s"), (2, "other words", "en", "s")]
        )
        out = {
            r["doc_id"]: r["contaminated"]
            for r in curation.contamination_flags(corpus, bench, n=8).collect()
        }
        assert out == {1: True, 2: False}

    def test_benchmark_side_is_broadcast(self, spark):
        bench = _docs(spark, [(100, "a b c d e f g h", "en", "s")])
        corpus = _docs(spark, [(1, "a b c d e f g h", "en", "s")])
        plan = curation.contamination_flags(corpus, bench)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestPackSequences:
    def rows(self, toks_per_doc, source="s"):
        return [
            (i, " ".join(["w"] * n), "en", source) for i, n in enumerate(toks_per_doc)
        ]

    def bins(self, spark, toks_per_doc, budget):
        df = curation.pack_sequences(_docs(spark, self.rows(toks_per_doc)), budget)
        return [
            r["bin_id"] for r in df.orderBy("doc_id").collect()
        ]

    def test_greedy_fill(self, spark):
        # 50+60 fit 120; +30 overflows -> new bin; 120 exactly fills bin 2
        assert self.bins(spark, [50, 60, 30, 90, 120], 120) == [0, 0, 1, 1, 2]

    def test_oversize_doc_gets_own_bin(self, spark):
        assert self.bins(spark, [200, 10, 10], 120) == [0, 1, 1]

    def test_first_doc_oversize_stays_bin_zero(self, spark):
        assert self.bins(spark, [300], 120) == [0]

    def test_groups_pack_independently(self, spark):
        rows = self.rows([100, 100], source="a") + [
            (10, " ".join(["w"] * 100), "en", "b"),
            (11, " ".join(["w"] * 10), "en", "b"),
        ]
        df = curation.pack_sequences(_docs(spark, rows), 120)
        got = {(r["source"], r["doc_id"]): r["bin_id"] for r in df.collect()}
        assert got == {("a", 0): 0, ("a", 1): 1, ("b", 10): 0, ("b", 11): 0}

    def test_bin_never_exceeds_budget_except_oversize(self, spark):
        toks = [37, 81, 12, 120, 5, 64, 99, 3, 118, 40]
        df = curation.pack_sequences(_docs(spark, self.rows(toks)), 120)
        fills = (
            df.groupBy("source", "bin_id")
            .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
            .collect()
        )
        for r in fills:
            assert r["fill"] <= 120 or r["n"] == 1


class TestPiiRedact:
    def test_patterns_and_digest(self, spark):
        df = _docs(
            spark,
            [
                (1, "mail bob@corp.example.org from 192.168.0.1 acct 123456789", "en", "s"),
                (2, "clean text with no pii at all", "en", "s"),
            ],
        )
        out = {r["doc_id"]: r for r in curation.pii_redact(df).collect()}
        assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_digits"]) == (1, 1, 1)
        assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_digits"]) == (0, 0, 0)
        assert out[1]["redacted_md5"] != out[2]["redacted_md5"]

    def test_email_digits_not_double_counted(self, spark):
        # digits inside the email are consumed by the email replacement
        df = _docs(spark, [(1, "x 123456789@mail.example.com y", "en", "s")])
        r = curation.pii_redact(df).collect()[0]
        assert r["n_email"] == 1
        # count runs on the ORIGINAL text per pattern; replacement order
        # still ensures the redacted text has no leftover digit run
        red = df.select(
            F.md5(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.col("text"), curation.PII_PATTERNS[0][1], "<EMAIL>"
                        ),
                        curation.PII_PATTERNS[1][1],
                        "<IP>",
                    ),
                    curation.PII_PATTERNS[2][1],
                    "<NUM>",
                )
            ).alias("m")
        ).collect()[0]["m"]
        assert r["redacted_md5"] == red


class TestStratifiedSample:
    def corpus(self, spark, n=400):
        langs = ["en", "de", "fr", "zh"]
        return _docs(
            spark, [(i, "t", langs[i % 4], "s") for i in range(n)]
        )

    def test_rates_roughly_hold(self, spark):
        df = self.corpus(spark)
        out = curation.stratified_sample(
            df, {"en": 0.5, "de": 0.25}, default_rate=0.05
        )
        got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # 100 docs per lang; hash buckets are uniform-ish
        assert 35 <= got.get("en", 0) <= 65
        assert 13 <= got.get("de", 0) <= 38
        assert got.get("fr", 0) <= 15 and got.get("zh", 0) <= 15

    def test_deterministic_and_additive(self, spark):
        df = self.corpus(spark)
        keep1 = {
            r["doc_id"]
            for r in curation.stratified_sample(df, {"en": 0.2}).collect()
        }
        keep2 = {
            r["doc_id"]
            for r in curation.stratified_sample(df, {"en": 0.2}).collect()
        }
        assert keep1 == keep2
        # raising the rate only ADDS docs
        keep_hi = {
            r["doc_id"]
            for r in curation.stratified_sample(df, {"en": 0.5}).collect()
        }
        assert keep1 <= keep_hi

    def test_no_shuffle_map_only(self, spark):
        plan = (
            curation.stratified_sample(self.corpus(spark), {"en": 0.5})
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
