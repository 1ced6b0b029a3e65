"""Round-2 additions: as-of join, interval join, graph analytics,
repetition quality."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from kgx import asof, graph, textops

TS = dt.datetime


def test_asof_join_basic_and_tie_semantics(spark):
    build = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 10, 0, 0), 100, 10.0),
            (1, TS(2024, 1, 1, 12, 0, 0), 101, 20.0),
            # two build rows at the SAME ts: greatest tiebreak (event_id) wins
            (2, TS(2024, 1, 1, 9, 0, 0), 200, 1.0),
            (2, TS(2024, 1, 1, 9, 0, 0), 201, 2.0),
        ],
        "user_id int, ts timestamp, event_id long, value double",
    )
    probe = spark.createDataFrame(
        [
            (1, TS(2024, 1, 1, 11, 0, 0), 900),  # between builds -> 10.0
            (1, TS(2024, 1, 1, 12, 0, 0), 901),  # exactly at build ts -> visible
            (1, TS(2024, 1, 1, 9, 0, 0), 902),  # before any build -> null
            (2, TS(2024, 1, 1, 9, 30, 0), 903),  # tie on build side -> id 201
            (3, TS(2024, 1, 1, 9, 0, 0), 904),  # key with no build -> null
        ],
        "user_id int, ts timestamp, event_id long",
    )
    out = {
        r["event_id"]: r["prior_value"]
        for r in asof.asof_join(
            probe, build, on="user_id", payload=["value"], tiebreak="event_id"
        ).collect()
    }
    assert out == {900: 10.0, 901: 20.0, 902: None, 903: 2.0, 904: None}


def test_asof_join_tolerance_nulls_stale_matches(spark):
    build = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 0, 0), 1, 5.0)],
        "user_id int, ts timestamp, event_id long, value double",
    )
    probe = spark.createDataFrame(
        [(1, TS(2024, 1, 1, 0, 30, 0), 10), (1, TS(2024, 1, 2, 0, 0, 0), 11)],
        "user_id int, ts timestamp, event_id long",
    )
    out = {
        r["event_id"]: (r["prior_value"], r["prior_ts"])
        for r in asof.asof_join(
            probe,
            build,
            on="user_id",
            payload=["value"],
            tiebreak="event_id",
            tolerance_s=3600,
        ).collect()
    }
    assert out[10] == (5.0, TS(2024, 1, 1, 0, 0, 0))
    assert out[11] == (None, None)  # 24h-old match exceeds the 1h tolerance


def test_interval_join_matches_naive_range_join(spark):
    intervals = spark.createDataFrame(
        [
            (1, 100, TS(2024, 1, 1, 10, 0, 0), TS(2024, 1, 1, 13, 30, 0)),
            (1, 101, TS(2024, 1, 2, 0, 0, 0), TS(2024, 1, 2, 0, 0, 30)),
            (2, 200, TS(2024, 1, 1, 10, 0, 0), TS(2024, 1, 1, 11, 0, 0)),
        ],
        "user_id int, session_id long, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [
            (1, 1, TS(2024, 1, 1, 10, 0, 0)),  # at start boundary
            (1, 2, TS(2024, 1, 1, 13, 30, 0)),  # at end boundary
            (1, 3, TS(2024, 1, 1, 14, 0, 0)),  # outside
            (1, 4, TS(2024, 1, 2, 0, 0, 15)),  # inside the 30s interval
            (2, 5, TS(2024, 1, 1, 10, 30, 0)),  # other key
            (3, 6, TS(2024, 1, 1, 10, 30, 0)),  # key without intervals
        ],
        "user_id int, event_id long, ts timestamp",
    )
    got = sorted(
        (r["event_id"], r["session_id"])
        for r in asof.interval_join(
            points, intervals, on="user_id", bin_seconds=3600
        ).collect()
    )
    naive = sorted(
        (r["event_id"], r["session_id"])
        for r in points.join(intervals, "user_id")
        .filter(F.col("ts").between(F.col("start_ts"), F.col("end_ts")))
        .collect()
    )
    assert got == naive == [(1, 100), (2, 100), (4, 101), (5, 200)]


def _toy_edges(spark):
    pairs = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 12), (1, 10)], "cust long, supp long"
    )
    return graph.undirected_edges(pairs, "cust", "supp")


def test_undirected_edges_distinct_and_symmetric(spark):
    e = _toy_edges(spark)
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert ("c1", "s10") in rows and ("s10", "c1") in rows
    assert len(rows) == 8  # 4 distinct pairs x 2 directions


def test_pagerank_int_exact_values_on_toy_graph(spark):
    # path graph a-b, b-c: by symmetry a and c tie, b strictly higher
    pairs = spark.createDataFrame([(1, 10), (2, 10)], "cust long, supp long")
    e = graph.undirected_edges(pairs, "cust", "supp")
    r = {row["node"]: row["rank"] for row in graph.pagerank_int(e, iters=3).collect()}
    assert r["c1"] == r["c2"]
    assert r["s10"] > r["c1"]
    # exact integer recurrence, hand-unrolled:
    r0 = 10**12
    base = 15 * r0 // 100
    b1, a1 = base + (85 * (r0 // 1 * 2)) // 100, base + (85 * (r0 // 2)) // 100
    b2, a2 = base + (85 * (a1 // 1 * 2)) // 100, base + (85 * (b1 // 2)) // 100
    b3, a3 = base + (85 * (a2 // 1 * 2)) // 100, base + (85 * (b2 // 2)) // 100
    assert r["s10"] == b3 and r["c1"] == a3


def test_two_hop_counts(spark):
    e = _toy_edges(spark)
    src = spark.createDataFrame([("c1",)], "node string")
    out = {r["origin"]: r["n_two_hop"] for r in graph.two_hop_counts(e, src).collect()}
    # c1 -> {s10, s11} -> {c1, c2}; c1 excluded -> {c2}
    assert out == {"c1": 1}


def test_repetition_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),  # bigrams: "a b","b a","a b","b a" -> top count 2
            (2, "x y z"),  # all distinct
            (3, "w"),  # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.repetition(df).collect()}
    assert out[1]["n_words"] == 5
    assert out[1]["dup_word_frac"] == (5 - 2) / 5
    assert out[1]["top_bigram_count"] == 2
    assert out[1]["top_bigram_frac"] == 2 / 4
    assert out[2]["top_bigram_count"] == 1 and out[2]["dup_word_frac"] == 0.0
    assert out[3]["top_bigram_count"] == 0 and out[3]["top_bigram_frac"] is None


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count
    join WITHOUT any Exchange (and, sorted, without an extra Sort) —
    the co-location contract write_bucketed promises."""
    from kgx import materialize

    a = spark.range(0, 1000).selectExpr("cast(id as string) conv_id", "id * 2 AS x")
    b = spark.range(0, 1000).selectExpr("cast(id as string) conv_id", "id * 3 AS y")
    materialize.write_bucketed(a, "bkt_a", str(tmp_path / "a"), num_buckets=4)
    materialize.write_bucketed(b, "bkt_b", str(tmp_path / "b"), num_buckets=4)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the test exercises the shuffle path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "conv_id")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # unbucketed control: the same join DOES shuffle
        ctrl = a.join(b, "conv_id")
        ctrl_plan = ctrl._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in ctrl_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_kmeans_centroids_recover_clusters_and_lift_ivf_recall(spark):
    import pyspark.sql.functions as F2

    from kgx import similarity

    # two tight clusters around (10,0) and (0,10)
    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0 + (i % 2) * 0.1]) for i in range(20)]
    rows += [(100 + i, [0.0 + (i % 3) * 0.1, 10.0 + (i % 2) * 0.1]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = similarity.kmeans_centroids(df, k=2, iters=4)
    cents.sort(key=lambda c: c[0])
    assert abs(cents[0][1] - 10.05) < 0.2 and abs(cents[0][0] - 0.1) < 0.2
    assert abs(cents[1][0] - 10.1) < 0.2 and abs(cents[1][1] - 0.05) < 0.2
    # assignment splits the clusters exactly
    a = similarity.assign_cells(df, centroids=cents)
    n_cells = a.groupBy("cell").count().collect()
    assert sorted(r["count"] for r in n_cells) == [20, 20]
    # trained quantizer: nprobe=1 already finds same-cluster neighbors
    q = df.filter(F2.col("vec_id").isin(0, 100))
    out = similarity.ivf_topk(df, q, k=3, nprobe=1, centroids=cents).collect()
    assert len(out) == 6
    for r in out:
        same_cluster = (r["query_id"] < 100) == (r["neighbor_id"] < 100)
        assert same_cluster


def test_approx_profile_brackets_exact(spark):
    from kgx import stats

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = {r["event_type"]: r for r in stats.profile_numeric(ev).collect()}
    approx = {r["event_type"]: r for r in stats.profile_numeric_approx(ev).collect()}
    assert set(exact) == set(approx)
    vals = {
        k: sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == k).select("value").collect()
        )
        for k in exact
    }
    for k, e in exact.items():
        a = approx[k]
        assert a["n"] == e["n"] and a["vmin"] == e["vmin"] and a["vmax"] == e["vmax"]
        v = vals[k]
        for q, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            # approx_percentile returns an ORDER STATISTIC (no interpolation);
            # at accuracy=10000 its rank error on these group sizes is ~0 —
            # require it to be an actual value within ±2 ranks of the target
            target = p * (len(v) - 1)
            lo, hi = max(0, int(target) - 2), min(len(v) - 1, int(target) + 3)
            assert a[q] in v[lo : hi + 1], (k, q, a[q], v[lo : hi + 1])


def test_ts_day_partition_pruning(spark, tmp_path):
    """The date-partitioned triples layout (materialize.write_triples,
    the Iceberg days(ts) analogue) must prune at the scan: a ts_day
    filter shows up as PartitionFilters and non-matching partitions are
    never read."""
    import pyspark.sql.functions as F2

    from kgx import materialize

    df = spark.range(0, 100).select(
        F2.col("id").alias("conv_id"),
        F2.lit(1).alias("score_i"),
        F2.when(F2.col("id") % 2 == 0, "2025-01-01")
        .otherwise("2025-01-02")
        .alias("ts_day"),
    )
    out = str(tmp_path / "triples")
    materialize.write_triples(df, out)
    read = spark.read.parquet(out).filter(F2.col("ts_day") == "2025-01-01")
    assert read.count() == 50
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2025-01-01" in plan, plan
    # the pruned scan lists only the matching partition directory
    files = [
        f.asDict()["file_path"] if hasattr(f, "asDict") else f["file_path"]
        for f in read.select(F2.input_file_name().alias("file_path")).distinct().collect()
    ]
    assert all("ts_day=2025-01-01" in p for p in files)


def test_invalid_conv_gate_drops_whole_conversation(spark):
    """Reference abort semantics (SentimentClassification.java:280-284 ->
    CompletePipelineWorker catch): one null-subject/pred fact poisons the
    WHOLE conversation — nothing partial survives."""
    from kgx import relations

    facts = spark.createDataFrame(
        [
            ("c1", "acme", "pred1", 1),
            ("c1", None, "pred1", 1),  # poisons all of c1
            ("c2", "acme", "pred1", -1),
            ("c3", "globex", None, 0),  # poisons all of c3
            ("c3", "acme", "pred2", 1),
        ],
        "conv_id string, entity_name string, pred string, score_i int",
    )
    kept = relations.drop_invalid_convs(facts)
    assert sorted(r["conv_id"] for r in kept.collect()) == ["c2"]
    assert sorted(
        r["conv_id"] for r in relations.invalid_convs(facts).collect()
    ) == ["c1", "c3"]


def test_kb_snapshot_roundtrip_and_job_flag(spark, tmp_path):
    """S9 production path: save_knowledge/load_knowledge round-trips the KB
    through parquet AND hand-editable TSV with an identical snapshot id
    (the kb_version stamped into lineage), loaded dims are Spark-usable,
    and a partial snapshot is a hard error, not a silently weaker KB."""
    import pytest

    from kgx import resources

    kb = resources.default_kb()
    for fmt in ("parquet", "tsv"):
        d = str(tmp_path / fmt)
        assert resources.save_knowledge(kb, d, fmt=fmt) == kb.version()
        loaded = resources.load_knowledge(d)
        assert loaded.version() == kb.version()
        assert sorted(loaded.gazetteer) == sorted(kb.gazetteer)
        assert sorted(loaded.indicators) == sorted(kb.indicators)
    # loaded dims build real DataFrames (native types survived the I/O)
    assert resources.load_knowledge(
        str(tmp_path / "parquet")
    ).indicators_df(spark).count() == len(kb.indicators)

    import os

    os.remove(str(tmp_path / "parquet" / "lexicon.parquet"))
    with pytest.raises(FileNotFoundError, match="lexicon"):
        resources.load_knowledge(str(tmp_path / "parquet"))


def test_triangle_counts_known_graph(spark):
    """K4 on {1,2,3,4} plus pendant 4-5: K4 has 4 triangles, each corner
    in exactly 3; node 5 is in none. Degree-ordered orientation must
    count each triangle exactly once per corner."""
    from kgx import graph

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "u int, v int",
    )
    got = {r["node"]: r["n_triangles"] for r in graph.triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_copurchase_edges_min_support(spark):
    """Suppliers linked iff they share >= 2 customers; hot-key fanout is
    per-customer and the weak (support-1) edge is pruned."""
    from kgx import graph

    pairs = spark.createDataFrame(
        [(100, 1), (100, 2), (101, 1), (101, 2), (101, 3), (102, 2), (102, 3)],
        "cust int, supp int",
    )
    got = sorted(
        (r["u"], r["v"])
        for r in graph.copurchase_edges(pairs, "cust", "supp", min_support=2).collect()
    )
    assert got == [(1, 2), (2, 3)]
