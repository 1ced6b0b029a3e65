"""Tests for kgx.sketch (mergeable HLL distinct sketches)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kgx import sketch


def _events(spark, n=4000, types=4):
    return spark.range(n).select(
        (F.col("id") % types).cast("string").alias("event_type"),
        # ~n/8 distinct users per type, skewed repeats
        F.pmod(F.col("id") * 2654435761, F.lit(500)).alias("user_id"),
    )


class TestHll:
    def test_register_table_bounded(self, spark):
        df = _events(spark)
        regs = sketch.hll_registers(df, "user_id", ["event_type"], p=6)
        counts = regs.groupBy("event_type").count().collect()
        assert counts and all(r["count"] <= 64 for r in counts)

    def test_estimate_accuracy(self, spark):
        df = _events(spark)
        est = sketch.hll_distinct(df, "user_id", ["event_type"], p=6)
        exact = df.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("exact")
        )
        rows = est.join(exact, "event_type").collect()
        assert rows
        for r in rows:
            # raw HLL at m=64 has ~13% standard error; allow 3 sigma
            assert abs(r["hll_estimate"] - r["exact"]) / r["exact"] < 0.4

    def test_shard_merge_equals_whole(self, spark):
        """Sketch-of-shards == sketch-of-whole: the property that lets a
        1000-executor pipeline sketch per day/shard and merge later."""
        df = _events(spark)
        whole = sketch.hll_registers(df, "user_id", ["event_type"], p=6)
        a = sketch.hll_registers(
            df.where(F.col("user_id") % 2 == 0), "user_id", ["event_type"], p=6
        )
        b = sketch.hll_registers(
            df.where(F.col("user_id") % 2 == 1), "user_id", ["event_type"], p=6
        )
        merged = sketch.merge_registers(a, b, ["event_type"])

        def canon(regs):
            return {
                (r["event_type"], r["reg"]): r["max_rho"] for r in regs.collect()
            }

        assert canon(merged) == canon(whole)

    def test_merge_idempotent(self, spark):
        df = _events(spark, n=1000)
        regs = sketch.hll_registers(df, "user_id", ["event_type"], p=6)
        twice = sketch.merge_registers(regs, regs, ["event_type"])
        est1 = sketch.hll_estimate(regs, ["event_type"], p=6).collect()
        est2 = sketch.hll_estimate(twice, ["event_type"], p=6).collect()
        assert {r["event_type"]: r["hll_estimate"] for r in est1} == {
            r["event_type"]: r["hll_estimate"] for r in est2
        }

    def test_single_shuffle_plan(self, spark):
        """registers+estimate = two aggs over the SAME grouping prefix; the
        register agg map-side-combines so post-shuffle rows are <= m per
        group. No join, no extra exchange beyond the two aggs."""
        df = _events(spark)
        plan = (
            sketch.hll_distinct(df, "user_id", ["event_type"], p=6)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
