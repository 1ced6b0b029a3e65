"""Round-4b operators: Count-Min sketch, Bloom filter, TF-IDF, unigram
likelihood, and the coref-lite entity carryover. Each test pins the
property that makes the operator trustworthy at scale, independent of the
DuckDB oracle rows (which pin cross-engine value equality)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from kgx import mentions, resources, sketch, textops

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def doc_tokens(docs):
    return docs.select(
        "doc_id",
        "lang",
        F.explode(textops.tokens(F.lower(F.col("text")))).alias("token"),
    )


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_never_undercounts(doc_tokens):
    """The defining CMS guarantee: estimate >= true count, for EVERY token
    in the corpus (not just the registry's probe list)."""
    cells = sketch.cms_counts(doc_tokens, "token", ["lang"], depth=3, width=32)
    probes = doc_tokens.select("lang", F.col("token").alias("probe")).distinct()
    est = sketch.cms_point_query(cells, probes, ["lang"], "probe", depth=3, width=32)
    exact = doc_tokens.groupBy("lang", F.col("token").alias("probe")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    bad = (
        est.join(exact, ["lang", "probe"])
        .where(F.col("cms_count") < F.col("exact"))
        .count()
    )
    assert bad == 0


def test_cms_shard_merge_equals_single_pass(doc_tokens):
    """Distributivity: sketching disjoint shards and merging == sketching
    the whole corpus, cell-for-cell (sum distributes over disjoint union)."""
    whole = sketch.cms_counts(doc_tokens, "token", ["lang"], depth=2, width=16)
    a = sketch.cms_counts(
        doc_tokens.where(F.col("doc_id") % 2 == 0), "token", ["lang"], 2, 16
    )
    b = sketch.cms_counts(
        doc_tokens.where(F.col("doc_id") % 2 == 1), "token", ["lang"], 2, 16
    )
    merged = sketch.cms_merge(a, b, ["lang"])
    diff = whole.exceptAll(merged).count() + merged.exceptAll(whole).count()
    assert diff == 0


def test_cms_absent_probe_zero_or_collision(spark, doc_tokens):
    """A probe absent from the corpus estimates >= 0; at a generous width
    (few collisions) it estimates exactly 0."""
    cells = sketch.cms_counts(doc_tokens, "token", ["lang"], depth=3, width=4096)
    probes = doc_tokens.select("lang").distinct().withColumn(
        "probe", F.lit("zzz_never_in_corpus")
    )
    est = sketch.cms_point_query(cells, probes, ["lang"], "probe", 3, 4096)
    rows = est.collect()
    assert rows and all(r.cms_count == 0 for r in rows)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(doc_tokens):
    """Every inserted value must probe as member — the guarantee that makes
    Bloom safe for decontamination (misses are impossible, only extra
    flags)."""
    values = doc_tokens.select("token").distinct()
    bits = sketch.bloom_bits(values, "token", m_bits=256, k=3)
    probed = sketch.bloom_probe(
        values.withColumn("key", F.lit(1)), "token", ["key"], bits, 256, 3
    )
    assert probed.where(~F.col("bloom_member")).count() == 0


def test_bloom_rejects_most_non_members(spark):
    """Sanity on the false-positive side: with a roomy filter, values never
    inserted mostly probe negative (not a tautology — a broken hash that
    sets every bit would pass the no-false-negative test)."""
    ins = spark.range(100).select(F.concat(F.lit("in-"), F.col("id")).alias("v"))
    out = spark.range(100).select(F.concat(F.lit("out-"), F.col("id")).alias("v"))
    bits = sketch.bloom_bits(ins, "v", m_bits=4096, k=3)
    probed = sketch.bloom_probe(
        out.withColumn("key", F.lit(1)), "v", ["key"], bits, 4096, 3
    )
    fp = probed.where(F.col("bloom_member")).count()
    # fill ~ 300/4096 = 7.3%; fp rate ~ 0.073^3 ~ 4e-4 -> expect ~0 of 100
    assert fp <= 5


def test_bloom_flags_superset_of_exact_contamination(spark):
    """Against the exact decontamination operator on the same split: Bloom
    must flag every doc with true benchmark overlap (no false negatives
    end-to-end, not just per-value)."""
    from kgx.queries import curate_contamination, sketch_bloom_contamination

    exact = curate_contamination(spark, SF_DIR).where(F.col("n_overlap") > 0)
    bloom = sketch_bloom_contamination(spark, SF_DIR).where(F.col("flagged"))
    missed = exact.select("doc_id").exceptAll(bloom.select("doc_id")).count()
    assert missed == 0


# ---------------------------------------------------------------------------
# TF-IDF / unigram likelihood
# ---------------------------------------------------------------------------


def test_tfidf_matches_independent_recompute(docs):
    """Differential test: recompute per-doc top-5 rational TF-IDF from raw
    text in plain Python (own tokenizer walk, own counts) and compare rows
    exactly — catches wrong df scope, wrong N, off-by-one ranks."""
    raw = docs.select("doc_id", "text").collect()
    tf: dict = {}
    for r in raw:
        toks = r.text.strip().lower().split()
        d = tf.setdefault(r.doc_id, {})
        for t in toks:
            d[t] = d.get(t, 0) + 1
    n_docs = len(tf)
    dfreq: dict = {}
    for d in tf.values():
        for t in d:
            dfreq[t] = dfreq.get(t, 0) + 1
    expected = set()
    for doc_id, d in tf.items():
        scored = sorted(
            ((t, c, dfreq[t], c * n_docs / dfreq[t]) for t, c in d.items()),
            key=lambda x: (-x[3], x[0]),
        )[:5]
        for rank, (t, c, df_, s) in enumerate(scored, 1):
            expected.add((doc_id, t, c, df_, n_docs, s, rank))
    got = {
        (r.doc_id, r.token, r.tf, r.doc_freq, r.n_docs, r.tfidf, r.rank)
        for r in textops.tfidf_topk(docs, k=5).collect()
    }
    assert got == expected


def test_tfidf_log_ranking_agrees_within_fixed_tf(docs):
    """The documented (weaker) relation to classic tf*ln(N/df): among a
    doc's rows with EQUAL tf, rational and log rankings agree (ln is
    monotone in N/df)."""
    out = textops.tfidf_topk(docs, k=5).collect()
    by_doc_tf: dict = {}
    for r in out:
        by_doc_tf.setdefault((r.doc_id, r.tf), []).append(r)
    for rows in by_doc_tf.values():
        rows.sort(key=lambda r: r.rank)
        log_scores = [r.tf * math.log(r.n_docs / r.doc_freq) for r in rows]
        assert log_scores == sorted(log_scores, reverse=True)


def test_tfidf_rank_bounds(docs):
    out = textops.tfidf_topk(docs, k=5)
    assert out.where((F.col("rank") < 1) | (F.col("rank") > 5)).count() == 0
    per_doc = out.groupBy("doc_id").count()
    assert per_doc.where(F.col("count") > 5).count() == 0


def test_unigram_likelihood_bounds(docs):
    """Score is a mean of probabilities: 0 < score <= max token prob <= 1;
    and the exact integer ratio reproduces the double."""
    out = textops.unigram_likelihood(docs).collect()
    assert out
    for r in out:
        assert 0.0 < r.unigram_likelihood <= 1.0
        assert r.unigram_likelihood == r.lik_num / r.lik_den


# ---------------------------------------------------------------------------
# Entity carryover (coref-lite)
# ---------------------------------------------------------------------------


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, t, "user", txt, None, "2025-01-01 00:00:00") for (c, t, txt) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_stream_carry_rows_batch_parity(spark):
    """The streaming emitter's pandas kernel must produce exactly the
    batch operator's rows for the same buffered turns — the parity that
    lets stream_entity_carryover share the batch oracle SQL."""
    from kgx.streaming.carryover_stream import _carry_rows

    tr = _turns(
        spark,
        [
            ("cx", 0, "nothing yet"),
            ("cx", 1, "spark and window appear"),
            ("cx", 2, "quiet"),
            ("cx", 3, "vector only"),
            ("cx", 4, "quiet again"),
        ],
    )
    batch = {
        (r.conv_id, r.turn_idx, r.entity, r.src_turn_idx, r.carried)
        for r in mentions.entity_carryover(tr, resources.driver_kb()).collect()
    }
    # buffered out of order, as a stream would deliver them
    idxs = [3, 0, 4, 1, 2]
    sets = ["vector", "", "", "spark|window", ""]
    got = {
        ("cx", r.turn_idx, r.entity, r.src_turn_idx, r.carried)
        for r in _carry_rows("cx", idxs, sets).itertuples()
    }
    assert got == batch


def test_stream_carry_rows_duplicate_delivery_deterministic():
    """Redelivered turn_idx resolves to the min sorted-set winner, whatever
    the arrival order."""
    from kgx.streaming.carryover_stream import _carry_rows

    a = _carry_rows("c", [0, 0, 1], ["spark", "customer", ""], )
    b = _carry_rows("c", [0, 0, 1], ["customer", "spark", ""], )
    ra = {(r.turn_idx, r.entity, r.src_turn_idx) for r in a.itertuples()}
    rb = {(r.turn_idx, r.entity, r.src_turn_idx) for r in b.itertuples()}
    assert ra == rb == {(0, "customer", 0), (1, "customer", 0)}


def test_carryover_semantics(spark):
    """Hand-built conversation: SO at turn 0, silence, new SO at turn 3,
    silence; plus a conversation that never mentions an SO."""
    tr = _turns(
        spark,
        [
            ("c1", 0, "spark is fast"),
            ("c1", 1, "it got slower"),  # no SO -> carries spark from 0
            ("c1", 2, "still nothing here"),
            ("c1", 3, "customer and vector now"),  # new SO set
            ("c1", 4, "they remain"),  # carries {customer, vector} from 3
            ("c2", 0, "no entities at all"),  # conversation never emits
            ("c3", 0, "quiet start"),  # pre-first-SO turn emits nothing
            ("c3", 1, "window opens"),
        ],
    )
    out = mentions.entity_carryover(tr, resources.driver_kb())
    rows = {(r.conv_id, r.turn_idx, r.entity): (r.src_turn_idx, r.carried)
            for r in out.collect()}
    assert rows[("c1", 0, "spark")] == (0, False)
    assert rows[("c1", 1, "spark")] == (0, True)
    assert rows[("c1", 2, "spark")] == (0, True)
    assert rows[("c1", 3, "customer")] == (3, False)
    assert rows[("c1", 3, "vector")] == (3, False)
    assert rows[("c1", 4, "customer")] == (3, True)
    assert rows[("c1", 4, "vector")] == (3, True)
    assert ("c1", 3, "spark") not in rows  # new SO set replaces, not unions
    assert not any(k[0] == "c2" for k in rows)
    assert ("c3", 0, "window") not in rows
    assert rows[("c3", 1, "window")] == (1, False)


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------


def _emb_frame(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_pq_adc_matches_python_recompute(spark):
    """Differential: ADC distances recomputed in plain Python from the same
    codebooks must equal the Spark operator's output exactly (codes,
    tables and the ordered fold are all deterministic)."""
    from kgx.queries import _pq_codebooks
    from kgx import similarity

    cbs = _pq_codebooks()
    rng_rows = [
        (i, [((i * 37 + j * 11) % 17 - 8) / 4.0 for j in range(64)])
        for i in range(12)
    ]
    emb = _emb_frame(spark, rng_rows)
    q = emb.filter(F.col("vec_id") < 2)
    got = {
        (r.query_id, r.neighbor_id): (r.adc_dist, r.rank)
        for r in similarity.pq_topk(emb, q, k=3, codebooks=cbs).collect()
    }

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    def encode(v):
        codes = []
        for s in range(8):
            sub = v[s * 8 : (s + 1) * 8]
            best = min((sqd(sub, cbs[s][c]), c) for c in range(16))
            codes.append(best[1])
        return codes

    vecs = {i: [float(__import__("numpy").float32(x)) for x in v] for i, v in rng_rows}
    codes = {i: encode(v) for i, v in vecs.items()}
    for qid in (0, 1):
        dists = []
        for nid, v in vecs.items():
            if nid == qid:
                continue
            acc = 0.0
            for s in range(8):
                acc = acc + sqd(vecs[qid][s * 8 : (s + 1) * 8], cbs[s][codes[nid][s]])
            dists.append((acc, nid))
        dists.sort()
        for rank, (d, nid) in enumerate(dists[:3], 1):
            assert got[(qid, nid)] == (d, rank)


def test_pq_planted_duplicate_retrieves_at_zero(spark):
    """Vectors built exactly from codebook rows quantize losslessly: a
    planted duplicate of the query retrieves at rank 1 with adc_dist 0."""
    from kgx.queries import _pq_codebooks
    from kgx import similarity

    cbs = _pq_codebooks()
    v0 = [x for s in range(8) for x in cbs[s][3]]
    v1 = [x for s in range(8) for x in cbs[s][9]]
    # decoy built from a THIRD code per subspace (a same-codes decoy like
    # 0.5*v0 would legitimately tie at adc 0 — quantization is lossy by
    # design and ties resolve by id)
    v2 = [x for s in range(8) for x in cbs[s][5]]
    rows = [(0, v0), (100, list(v0)), (1, v1), (101, list(v1)), (2, v2)]
    emb = _emb_frame(spark, rows)
    q = emb.filter(F.col("vec_id") < 2)
    top = {
        r.query_id: (r.neighbor_id, r.adc_dist)
        for r in similarity.pq_topk(emb, q, k=1, codebooks=cbs).collect()
    }
    assert top[0] == (100, 0.0)
    assert top[1] == (101, 0.0)


# ---------------------------------------------------------------------------
# Funnel
# ---------------------------------------------------------------------------


def test_events_funnel_greedy_order_semantics(spark, tmp_path):
    """Hand-built histories: pre-step events don't count, steps must occur
    strictly after the previous match, ties on ts break by event_id."""
    import datetime as dt

    def ts(m):
        return dt.datetime(2025, 1, 1, 0, m)

    rows = [
        # u1: click BEFORE view (ignored), then full funnel
        (1, ts(0), 10, "click", 0.0, ""),
        (2, ts(1), 10, "view", 0.0, ""),
        (3, ts(2), 10, "click", 0.0, ""),
        (4, ts(3), 10, "purchase", 0.0, ""),
        # u2: purchase before click -> stuck at stage 2? no: view, purchase,
        # click -> purchase precedes click so stage ends at 2 (view+click)
        (5, ts(0), 20, "view", 0.0, ""),
        (6, ts(1), 20, "purchase", 0.0, ""),
        (7, ts(2), 20, "click", 0.0, ""),
        # u3: same-ts tie -> event_id order decides (view id 8 < click id 9)
        (8, ts(0), 30, "view", 0.0, ""),
        (9, ts(0), 30, "click", 0.0, ""),
        # u4: never views
        (10, ts(0), 40, "signup", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    from kgx.queries import events_funnel

    got = {
        r.user_id: (r.funnel_stage, r.view_event_id, r.click_event_id, r.purchase_event_id)
        for r in events_funnel(spark, str(tmp_path)).collect()
    }
    assert got[10] == (3, 2, 3, 4)
    assert got[20] == (2, 5, 7, None)
    assert got[30] == (2, 8, 9, None)
    assert got[40] == (0, None, None, None)
