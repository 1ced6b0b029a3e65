"""Spark-native deterministic bench-corpus generator.

The pytest corpus (kgx.synth) is pandas-built and oracle-checked; for
throughput/scaling runs we need 10^6-10^7 turns, so this generator builds
the same transcript shape entirely with JVM expressions (hash-derived
pseudo-randomness, no Python in the loop) and writes partitioned parquet —
~10M turns in well under a minute on local[32], and the identical approach
scales to 10^12 turns on a cluster (it's just a projected `spark.range`).

Statistical shape mirrors synth.make_transcripts: ~55% of turns in
entity-bearing convs mention a gazetteer surface with Zipf-ish popularity,
orientation terms appear with multiplicity, ~15% of convs have no entity
(fallback branch), ts spans several days.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from kgx import resources


def generate_transcripts(
    spark: SparkSession,
    n_turns: int,
    turns_per_conv: int = 20,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    kb = resources.default_kb()
    surfaces = [s for (_u, _n, _t, s) in kb.gazetteer]
    pos = list(resources.POSITIVE_TERMS)
    neg = list(resources.NEGATIVE_TERMS)
    inds = [row[2] for row in kb.indicators]
    feats = [s for (s, _c) in kb.feature_surfaces]
    filler = (
        "the market report today noted that analysts were watching closely as "
        "trading volumes stayed steady and investors considered their positions"
    ).split()

    n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
    df = spark.range(0, n_turns, 1, n_partitions)

    def h(salt: int):
        return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))

    conv = (F.col("id") / turns_per_conv).cast("long")

    def ch(salt: int):  # conv-level hash
        return F.abs(F.xxhash64(conv, F.lit(seed), F.lit(salt)))

    # Zipf-ish surface pick: square the uniform to skew toward low ranks
    u = (h(1) % 1000).cast("double") / 1000.0
    zipf_idx = F.least(
        (u * u * len(surfaces)).cast("int"), F.lit(len(surfaces) - 1)
    )
    surface_arr = F.array(*[F.lit(s) for s in surfaces])
    pos_arr = F.array(*[F.lit(s) for s in pos])
    neg_arr = F.array(*[F.lit(s) for s in neg])
    ind_arr = F.array(*[F.lit(s) for s in inds])
    feat_arr = F.array(*[F.lit(s) for s in feats])
    filler_arr = F.array(*[F.lit(s) for s in filler])

    conv_has_entities = (ch(2) % 100) >= 15  # ~85% of convs
    r = (h(3) % 100).cast("int")

    base = F.concat_ws(
        " ",
        *[
            F.element_at(filler_arr, (h(10 + i) % len(filler) + 1).cast("int"))
            for i in range(10)
        ],
    )

    def maybe(term_col, cond):
        return F.when(cond, F.concat(F.lit(" "), term_col)).otherwise(F.lit(""))

    entity_part = maybe(
        F.element_at(surface_arr, zipf_idx + 1), conv_has_entities & (r < 55)
    )
    indicator_part = maybe(
        F.element_at(ind_arr, (h(4) % len(inds) + 1).cast("int")),
        conv_has_entities & (r >= 55) & (r < 70),
    )
    feature_part = maybe(
        F.element_at(feat_arr, (h(5) % len(feats) + 1).cast("int")),
        conv_has_entities & (r < 55) & ((h(6) % 100) < 35),
    )
    pos_part = F.concat(
        maybe(F.element_at(pos_arr, (h(7) % len(pos) + 1).cast("int")), (h(7) % 3) > 0),
        maybe(F.element_at(pos_arr, (h(17) % len(pos) + 1).cast("int")), (h(17) % 3) > 1),
    )
    neg_part = F.concat(
        maybe(F.element_at(neg_arr, (h(8) % len(neg) + 1).cast("int")), (h(8) % 3) > 0),
        maybe(F.element_at(neg_arr, (h(18) % len(neg) + 1).cast("int")), (h(18) % 3) > 1),
    )

    text = F.concat(base, entity_part, indicator_part, feature_part, pos_part, neg_part)

    return df.select(
        F.concat(F.lit(f"bconv-{seed}-"), F.lpad(conv.cast("string"), 10, "0")).alias(
            "conv_id"
        ),
        (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (h(9) % 3 + 1).cast("int"),
        ).alias("role"),
        text.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (
            F.lit("2025-06-01 08:00:00").cast("timestamp")
            + F.make_interval(secs=(ch(11) % (6 * 86400)) + (F.col("id") % turns_per_conv) * 60)
        ).alias("ts"),
    )


def write_bench_corpus(
    spark: SparkSession, path: str, n_turns: int, seed: int = 42
) -> None:
    generate_transcripts(spark, n_turns, seed=seed).write.mode("overwrite").parquet(path)
