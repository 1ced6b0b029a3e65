"""Round-5c tests: late-round operator batches — landmark BFS distances,
tool-transition matrix, NSP pairs, histogram quantile sketch (merge ==
single pass), soft-dedup sampling weights, weekly cohort retention,
k-core peeling, personalized PageRank, boilerplate removal, hash-bucket
train split, T5 span corruption."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from kgx import assemble, curation, graph, sketch, stats


# ------------------------------------------------------- landmark BFS ----


def test_landmark_distances_bfs_levels_and_cutoff(spark):
    # star at h (deg 4) + tail c-d-e-f beyond it; h is the unique
    # top-degree landmark
    und = [("h", x) for x in "abcz"] + [("c", "d"), ("d", "e"), ("e", "f")]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src string, dst string"
    )
    out = graph.landmark_distances(edges, n_landmarks=1, max_depth=3)
    got = {(r.landmark, r.node): r.dist for r in out.collect()}
    assert all(lm == "h" for lm, _ in got)
    assert got[("h", "h")] == 0
    assert got[("h", "a")] == 1 and got[("h", "c")] == 1
    assert got[("h", "d")] == 2
    assert got[("h", "e")] == 3
    # f is at distance 4 — beyond max_depth, must be absent
    assert ("h", "f") not in got
    # BFS first-visit is minimal: no duplicate (landmark, node) rows
    assert out.count() == len(got)


def test_landmark_pick_is_degree_then_id_deterministic(spark):
    # b and c tie on degree 2; id ascending breaks the tie
    und = [("a", "b"), ("a", "c"), ("b", "c")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    out = graph.landmark_distances(edges, n_landmarks=2, max_depth=1)
    assert {r.landmark for r in out.collect()} == {"a", "b"}


# --------------------------------------------------- tool transitions ----


def test_tool_transitions_counts_and_probabilities(spark):
    rows = [
        ("c1", 0, "search"), ("c1", 1, "code"), ("c1", 2, "search"),
        ("c2", 0, "search"), ("c2", 1, "code"),
        ("c2", 2, None), ("c2", 3, "browse"),  # NULL breaks the bigram
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string"
    )
    got = {
        (r.tool, r.next_tool): (r.n, r.row_total, r.p)
        for r in assemble.tool_transitions(tr).collect()
    }
    # search->code twice (c1, c2); code->search once; code->NULL and
    # NULL->browse excluded
    assert got[("search", "code")] == (2, 2, 1.0)
    assert got[("code", "search")][0] == 1
    assert ("code", None) not in got and (None, "browse") not in got
    # probabilities per source tool sum to 1
    sums = {}
    for (tool, _), (n, total, p) in got.items():
        sums[tool] = sums.get(tool, 0.0) + p
        assert p == n / total
    assert all(abs(s - 1.0) < 1e-12 for s in sums.values())


# ------------------------------------------------------------ NSP ----


def test_nsp_pairs_positive_and_negative_contracts(spark):
    rows = [
        ("c1", 0, "a0"), ("c1", 1, "a1"), ("c1", 2, "a2"),
        ("c2", 0, "b0"), ("c2", 1, "b1"),
    ]
    tr = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = assemble.nsp_pairs(tr).collect()
    pos = {(r.conv_id, r.turn_idx): r.sent_b for r in out if r.label == 1}
    # every turn with a successor yields exactly its next turn's text
    assert pos == {("c1", 0): "a1", ("c1", 1): "a2", ("c2", 0): "b1"}
    negs = [r for r in out if r.label == 0]
    all_texts = {t for _, _, t in rows}
    for r in negs:
        # negative second sentences come from the corpus but never from
        # the anchor's own conversation
        assert r.sent_b in all_texts
        own = {t for c, _, t in rows if c == r.conv_id}
        assert r.sent_b not in own
    # at most one negative per anchor
    anchors = [(r.conv_id, r.turn_idx) for r in negs]
    assert len(anchors) == len(set(anchors))


# --------------------------------------------- histogram quantiles ----


def test_hist_quantiles_rank_semantics(spark):
    # values 1..100, 10 bins over [0, 100): bucket = v/10 clamped to 9
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "value double"
    ).withColumn("g", F.lit("x"))
    hist = sketch.hist_counts(df, "value", ["g"], 10, 0.0, 100.0)
    q = sketch.hist_quantiles(hist, ["g"], 10, 0.0, 100.0, (0.5, 0.99))
    got = {r.q: r for r in q.collect()}
    # p50: rank 50 -> bucket 4 (values 40..49 are 40 rows in buckets 0-4
    # hold 1..49 -> 49 rows... bucket b holds [10b,10b+10); value 50 sits
    # in bucket 5; cumulative through bucket 4 is 49 < 50, so bucket 5,
    # upper edge 60.0
    assert got[0.5].rank == 50
    assert got[0.5].bucket == 5 and got[0.5].q_est == 60.0
    # p99: rank 99 -> value 99 in bucket 9 (also the clamp bucket for 100)
    assert got[0.99].bucket == 9 and got[0.99].q_est == 100.0


def test_hist_merge_of_disjoint_shards_equals_single_pass(spark):
    df = spark.createDataFrame(
        [(i, float(i % 97)) for i in range(500)], "id long, value double"
    ).withColumn("g", (F.col("id") % 3).cast("string"))
    whole = sketch.hist_counts(df, "value", ["g"], 20, 0.0, 100.0)
    a = sketch.hist_counts(df.where("id % 2 = 0"), "value", ["g"], 20, 0.0, 100.0)
    b = sketch.hist_counts(df.where("id % 2 = 1"), "value", ["g"], 20, 0.0, 100.0)
    merged = sketch.hist_merge(a, b, ["g"])
    as_set = lambda h: {(r.g, r.bucket, r.n) for r in h.collect()}  # noqa: E731
    assert as_set(merged) == as_set(whole)


# ------------------------------------------------- dedup weights ----


def test_dedup_sample_weights_inverse_cluster_size(spark):
    docs = spark.createDataFrame(
        [
            (1, "same text"), (2, " SAME   text "), (3, "same text"),
            (4, "unique"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in curation.dedup_sample_weights(docs).collect()}
    assert got[1].cluster_size == 3 and got[1].weight == 1.0 / 3
    assert got[4].cluster_size == 1 and got[4].weight == 1.0
    # exactly the min-id row of each cluster is canonical
    assert got[1].is_canonical and not got[2].is_canonical
    assert not got[3].is_canonical and got[4].is_canonical
    # per-cluster weights sum to 1 — each unique text counted once in
    # expectation
    assert abs(sum(r.weight for r in got.values()) - 2.0) < 1e-12


# ---------------------------------------------- cohort retention ----


def test_cohort_retention_offsets_and_rates(spark):
    day = datetime.datetime(2024, 1, 1)  # a Monday
    wk = datetime.timedelta(days=7)
    rows = [
        # cohort week 0: users 1, 2; user 1 returns in weeks 1 and 2
        (1, day), (2, day), (1, day + wk), (1, day + 2 * wk),
        # cohort week 1: user 3, never returns
        (3, day + wk + datetime.timedelta(days=3, hours=5)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r.cohort_week, r.week_offset): (r.n_active, r.cohort_size, r.retention)
        for r in stats.cohort_retention(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 2, 0.5)
    assert got[("2024-01-01", 2)] == (1, 2, 0.5)
    # mid-week event truncates to its ISO Monday; cohort key is a string
    assert got[("2024-01-08", 0)] == (1, 1, 1.0)
    assert len(got) == 4


# ------------------------------------------------------------ k-core ----


def test_kcore_peels_cascade_to_fixpoint(spark):
    # triangle a-b-c (2-core) with pendant chain c-d-e: d and e peel in
    # two cascading rounds under k=2
    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    got = {r.node: r.deg for r in graph.kcore(edges, k=2, rounds=4).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_extra_rounds_are_noops(spark):
    und = [("a", "b"), ("b", "c"), ("a", "c")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    two = {(r.node, r.deg) for r in graph.kcore(edges, 2, rounds=2).collect()}
    six = {(r.node, r.deg) for r in graph.kcore(edges, 2, rounds=6).collect()}
    assert two == six


# -------------------------------------------------------------- PPR ----


def test_ppr_teleports_only_to_seeds(spark):
    und = [("s1", "a"), ("s1", "b"), ("x", "a"), ("x", "b")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    seeds = spark.createDataFrame([("s1",)], "src string")
    ranks = {r.node: r.rank for r in graph.ppr_int(edges, seeds, iters=3).collect()}
    # symmetric roles of s1 and x in the graph, but only s1 teleports:
    # s1 must strictly dominate x, and mass flows through a/b
    assert ranks["s1"] > ranks["x"]
    assert ranks["a"] == ranks["b"] > 0
    # non-seed with no inbound seed mass after 3 iters would be 0; here
    # everything is reachable so all ranks positive except none
    assert all(v >= 0 for v in ranks.values())


def test_ppr_reduces_to_pagerank_when_all_seeded(spark):
    und = [("a", "b"), ("b", "c")]
    edges = spark.createDataFrame(
        und + [(y, x) for x, y in und], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",), ("b",), ("c",)], "src string")
    pr = {r.node: r.rank for r in graph.pagerank_int(edges, iters=3).collect()}
    ppr = {r.node: r.rank for r in graph.ppr_int(edges, seeds, iters=3).collect()}
    assert pr == ppr


# ------------------------------------------------------ boilerplate ----


def test_boilerplate_removal_strips_high_df_sentences(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique alpha. COMMON FOOTER. more alpha"),
            (2, "beta text. common footer"),
            (3, "gamma. Common Footer"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in curation.boilerplate_removal(docs, max_df=2).collect()
    }
    # footer appears in 3 docs > max_df, normalized case-insensitively
    assert got[1].clean_text == "unique alpha. more alpha"
    assert got[1].n_kept == 2 and got[1].n_removed == 1
    assert got[2].clean_text == "beta text"
    # a doc that is ALL boilerplate survives with empty text
    all_bp = spark.createDataFrame(
        [(i, "same. same") for i in range(5)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in curation.boilerplate_removal(all_bp, max_df=2).collect()}
    assert out[0].clean_text == "" and out[0].n_kept == 0


# ------------------------------------------------------ train split ----


def test_train_split_deterministic_and_proportioned(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id long"
    )
    a = {r.doc_id: r.split for r in curation.train_split(docs).collect()}
    b = {r.doc_id: r.split for r in curation.train_split(docs).collect()}
    assert a == b  # stable across runs
    frac = {s: sum(1 for v in a.values() if v == s) / 2000 for s in set(a.values())}
    assert abs(frac["train"] - 0.90) < 0.03
    assert abs(frac["val"] - 0.05) < 0.02 and abs(frac["test"] - 0.05) < 0.02
    # growth stability: adding docs never reassigns existing ones
    docs2 = spark.createDataFrame([(i,) for i in range(3000)], "doc_id long")
    c = {r.doc_id: r.split for r in curation.train_split(docs2).collect()}
    assert all(c[k] == v for k, v in a.items())


# -------------------------------------------------- span corruption ----


def test_span_corruption_structure(spark):
    from kgx import textops

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    out = textops.span_corruption(docs, mask_pct=15).collect()
    for r in out:
        toks = r.input_text.split(" ")
        sentinels = [t for t in toks if t.startswith("<extra_id_")]
        # sentinels appear in order 0..n_spans-1, exactly once each
        assert sentinels == [f"<extra_id_{k}>" for k in range(r.n_spans)]
        # target contains every sentinel exactly once, in order
        if r.n_spans:
            tgt = r.target_text.split(" ")
            tgt_sent = [t for t in tgt if t.startswith("<extra_id_")]
            assert tgt_sent == sentinels
            # masked token count consistency: target tokens minus sentinels
            assert len(tgt) - len(tgt_sent) == r.n_masked
        else:
            assert r.target_text == ""
        # reconstruction: replacing each sentinel in the input with its
        # span from the target restores the original document
        spans = {}
        cur = None
        for t in r.target_text.split(" ") if r.n_spans else []:
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt = []
        for t in toks:
            rebuilt.extend(spans[t] if t in spans else [t])
        assert rebuilt == [f"w{j}" for j in range(40)]


# ------------------------------------------------------ URL normalize ----


def test_url_normalize_rules(spark):
    urls = [
        (1, "HTTPS://WWW.Site.COM/Page/One?utm_source=x&b=2&a=1#frag"),
        (2, "http://site.com/p"),
        (3, "https://Site.com/p?utm_campaign=c&utm_source=s"),
        (4, "https://site.com/CaseKeptPath?z=9&a=1"),
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {r.id: r.url_norm for r in curation.url_normalize(df).collect()}
    # host lowered, path case preserved, utm dropped, params sorted,
    # fragment stripped
    assert got[1] == "https://www.site.com/Page/One?a=1&b=2"
    assert got[2] == "http://site.com/p"
    # all params were tracking -> '?' collapses away
    assert got[3] == "https://site.com/p"
    assert got[4] == "https://site.com/CaseKeptPath?a=1&z=9"


# ------------------------------------------------- streaming bigrams ----


def test_stream_bigram_rows_batch_parity():
    # pure-Python kernel parity: duplicates resolve min-tool, NULLs break
    # bigrams, order restored from turn_idx
    from kgx.streaming.transitions_stream import _bigram_rows

    out = _bigram_rows(
        "c1",
        [2, 0, 1, 1, 3],
        ["code", "search", "zz", "browse", ""],
    )
    got = list(zip(out["turn_idx"], out["tool"], out["next_tool"]))
    # turn 1 dup resolves to 'browse' (min); turn 3 NULL-tool breaks the
    # (2,3) bigram
    assert got == [(0, "search", "browse"), (1, "browse", "code")]
