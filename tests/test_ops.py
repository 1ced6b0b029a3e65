"""Unit tests for operators not covered by the DuckDB oracle: approximate
dedup (vs exact), ANN recall (vs brute force), canonicalization merges,
decimal rounding parity, DoM bin edges, multimodal plumbing."""

from __future__ import annotations

from decimal import ROUND_HALF_EVEN, Decimal

import pyspark.sql.functions as F
import pytest

from kgx import canonical, dedup, multimodal, similarity
from kgx.resources import dom_label


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " lambda"),  # near dup of 0
        (3, "completely different words nothing shared here at all truly"),
        (4, base.replace("gamma", "mu")),  # near dup
        (5, "  Alpha beta GAMMA delta epsilon zeta eta theta iota kappa "),  # case/ws dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs).orderBy("dup_id").collect()
    assert [(r["keep_id"], r["dup_id"]) for r in out] == [(0, 1), (0, 5)]


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 5) in pairs and pairs[(0, 5)] == 1.0
    assert (0, 2) in pairs  # near dup
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_what_exact_finds(spark, docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs, n=3, k=32, bands=8, threshold=0.5).collect()
    }
    # LSH with 8 bands of 4 rows catches j>=0.5 pairs w.p. ~0.9+ each; on
    # this tiny corpus we require full recall of the j>=0.5 set
    assert exact <= approx | exact  # sanity
    missed = exact - approx
    assert len(missed) == 0, f"LSH missed {missed}"
    # and verification bounds precision: every reported pair really has j>=0.5
    for r in dedup.minhash_lsh_pairs(docs, n=3, k=32, bands=8, threshold=0.5).collect():
        assert r["jaccard"] >= 0.5


def test_simhash_dup_distance(spark, docs):
    fp = dedup.simhash_fingerprints(docs)
    rows = {r["doc_id"]: r["simhash"] for r in fp.collect()}
    assert rows[0] == rows[1]  # identical text → identical fingerprint
    ham_02 = bin(rows[0] ^ rows[2]).count("1")
    ham_03 = bin(rows[0] ^ rows[3]).count("1")
    assert ham_02 < ham_03, "near-dup should be closer than unrelated doc"
    cand = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_candidates(fp).collect()
    }
    assert cand.get((0, 1)) == 0


def test_embedding_neardup_and_ann(spark):
    import numpy as np

    rng = np.random.RandomState(0)
    base = rng.randn(8, 16).astype("float32")
    rows = []
    for i in range(8):
        rows.append((i, [float(x) for x in base[i]]))
        # a strongly-correlated near-duplicate vector
        rows.append((100 + i, [float(x) for x in (base[i] + 0.01 * rng.randn(16).astype("float32"))]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_pairs(emb, threshold=0.99).collect()
    }
    found = sum(1 for i in range(8) if (i, 100 + i) in pairs)
    assert found >= 6, f"banded hyperplane LSH found only {found}/8 true near-dups"

    # brute-force cosine top-1 must recover the planted neighbor exactly
    q = emb.filter(F.col("vec_id") < 8)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in similarity.brute_force_topk(emb, q, k=1).collect()
    }
    assert top1 == {i: 100 + i for i in range(8)}

    # IVF recall vs brute force at top-3
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.brute_force_topk(emb, q, k=3).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.ivf_topk(emb, q, k=3, n_cells=4, nprobe=2).collect()
    }
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, f"IVF recall {recall}"


# ---------------------------------------------------------------------------
# canonicalization
# ---------------------------------------------------------------------------

def test_connected_components_merges(spark):
    nodes = spark.createDataFrame(
        [
            (10, "Acme Corp", "u:acme", "Company"),
            (20, "ACME CORP", None, "Company"),  # same name lower → merge
            (30, "Globex", "u:globex", "Company"),
            (40, "Globex Intl", "u:globex", "Company"),  # same uri → merge
            (50, "Initech", "u:initech", "Company"),  # alone
            (60, "acme corp", "u:globex", "Company"),  # bridges both groups
        ],
        "entity_id long, name string, uri string, entity_type string",
    )
    edges = canonical.candidate_edges(nodes)
    cc = canonical.connected_components(nodes, edges)
    comp = {r["entity_id"]: r["canonical_id"] for r in cc.collect()}
    # 60 bridges {10,20,60} (name) with {30,40,60} (uri) → one component, min=10
    assert comp[10] == comp[20] == comp[30] == comp[40] == comp[60] == 10
    assert comp[50] == 50


# ---------------------------------------------------------------------------
# decimal / binning parity
# ---------------------------------------------------------------------------

def test_half_even_rounding(spark):
    """bround ≡ BigDecimal.setScale(16, ROUND_HALF_EVEN)
    (WorkerThread.java:160-162)."""
    vals = [(1.0, 3.0), (2.0, 3.0), (1.0, 7.0), (5.0, 6.0), (1.0, 2.0)]
    df = spark.createDataFrame(vals, "num double, den double")
    got = df.select(
        F.bround(F.col("num") / F.col("den"), 16).cast("decimal(18,16)").alias("s")
    ).collect()
    for (num, den), r in zip(vals, got):
        want = Decimal(repr(num / den)).quantize(
            Decimal("1e-16"), rounding=ROUND_HALF_EVEN
        )
        assert r["s"] == want, f"{num}/{den}: {r['s']} != {want}"


def test_dom_bin_edges():
    assert dom_label(0.0) == "no amount"
    assert dom_label(0.2) == "small amount"
    assert dom_label(0.39999) == "small amount"
    assert dom_label(0.4) == "moderate amount"
    assert dom_label(0.8) == "maximum amount"
    assert dom_label(1.0) == "maximum amount"
    assert dom_label(None) == "n/a"


def test_dom_expr_matches_python(spark):
    from kgx.aggregate import dom_label_expr

    vals = [(x / 20.0,) for x in range(21)]
    df = spark.createDataFrame(vals, "s double")
    got = df.select("s", dom_label_expr(F.col("s")).alias("l")).collect()
    for r in got:
        assert r["l"] == dom_label(r["s"]), r


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_multimodal_image_stub(spark):
    media = multimodal.make_fake_media(spark, n=30)
    feats = multimodal.decode_image_features(media, feat_dim=8, fake=True)
    rows = feats.collect()
    assert len(rows) == sum(1 for r in media.collect() if r["kind"] == "image")
    for r in rows:
        assert len(r["features"]) == 8
        assert 64 <= r["width"] <= 319
    # determinism: same input → same features
    rows2 = multimodal.decode_image_features(media, feat_dim=8, fake=True).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_multimodal_real_decode_never_fabricates(spark):
    """fake=False is the REAL stdlib header kernel (round 4): on bytes that
    are not a parseable image it must emit NULL metadata — never the
    hash-derived stand-in values — and features stay NULL (no model)."""
    media = multimodal.make_fake_media(spark, n=9)  # md5-noise payloads
    rows = multimodal.decode_image_features(media, fake=False).collect()
    assert rows  # image rows present
    assert all(
        r["width"] is None and r["height"] is None and r["features"] is None
        for r in rows
    )


def test_video_frame_sampling(spark):
    media = multimodal.make_fake_media(spark, n=30)
    frames = multimodal.sample_video_frames(media, every_ms=1000, fake=True)
    pdf = frames.toPandas()
    assert (pdf["ts_ms"] == pdf["frame_idx"] * 1000).all()
    vids = {r["media_id"]: r["meta_duration_ms"] for r in media.collect() if r["kind"] == "video"}
    counts = pdf.groupby("media_id").size().to_dict()
    for mid, dur in vids.items():
        assert counts[mid] == dur // 1000 + 1


# ---------------------------------------------------------------------------
# subfeature extraction (SENTIMENT subfeature FK, db_schema.sql:443)
# ---------------------------------------------------------------------------

def test_subfeature_second_feature_mention(spark):
    """The turn's second distinct feature mention becomes the fact's
    subfeature (alias-normalized); first stays the predicate; turns with one
    or zero feature mentions get subfeature null."""
    import pandas as pd

    from kgx import assemble, relations, resources

    kb = resources.default_kb()
    rows = [
        # price (pred) then volatility (subfeature), entity acme
        ("c1", 0, "user", "acme price rally and volatility spike", None, "2025-01-01 00:00:00"),
        # single feature -> subfeature null
        ("c2", 0, "user", "acme price rally", None, "2025-01-01 00:00:00"),
        # repeated same feature -> still null (distinct rule)
        ("c3", 0, "user", "acme price up price down", None, "2025-01-01 00:00:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    turns = assemble.admit_turns(spark.createDataFrame(pdf))
    facts, _tf = relations.extract_facts(turns, kb)
    got = {r["conv_id"]: (r["pred"], r["subfeature"]) for r in facts.collect()}
    assert got["c1"] == (resources.PRED_PRICE, resources.PRED_VOLATILITY)
    assert got["c2"] == (resources.PRED_PRICE, None)
    assert got["c3"] == (resources.PRED_PRICE, None)


def test_conversation_docs_offsets_slice_back(spark):
    """W1+W3: whole-conversation assembly — doc_text is turn texts joined in
    (conv_id, turn_idx) order regardless of input row order, and every
    turn_offsets entry slices doc_text back to exactly that turn's text."""
    import pandas as pd

    from kgx import assemble

    rows = [
        ("c1", 2, "user", "third turn here", None, "2025-01-01 00:00:02"),
        ("c1", 0, "user", "first", None, "2025-01-01 00:00:00"),
        ("c1", 1, "user", "second one", None, "2025-01-01 00:00:01"),
        ("c2", 0, "user", "solo", None, "2025-01-01 00:00:00"),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    docs = {
        r["conv_id"]: r
        for r in assemble.conversation_docs(spark.createDataFrame(pdf)).collect()
    }
    assert docs["c1"]["doc_text"] == "first\nsecond one\nthird turn here"
    assert docs["c1"]["n_turns"] == 3
    texts = {t: x for (c, t, _r, x, _tool, _ts) in rows if c == "c1"}
    for off in docs["c1"]["turn_offsets"]:
        assert docs["c1"]["doc_text"][off["begin"]:off["end"]] == texts[off["turn_idx"]]
    assert docs["c2"]["doc_text"] == "solo"


def test_multimodal_audio_stub(spark):
    """Audio decode plumbing: deterministic fake kernel, gated real path."""
    media = multimodal.make_fake_media(spark, n=24)
    out = multimodal.decode_audio_features(media, feat_dim=8, fake=True)
    rows = out.collect()
    assert rows and all(r["kind"] if False else len(r["features"]) == 8 for r in rows)
    assert all(1000 <= r["duration_ms"] <= 1000 + 255 * 16 for r in rows)
    assert all(r["sample_rate"] in (8000, 16000, 24000, 32000) for r in rows)
    # deterministic re-run
    assert sorted(map(str, rows)) == sorted(map(str, out.collect()))
    # real path (round 4): non-WAV bytes yield NULL metadata, not fakes
    real = multimodal.decode_audio_features(media, fake=False).collect()
    assert real and all(
        r["duration_ms"] is None and r["features"] is None for r in real
    )
