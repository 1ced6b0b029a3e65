"""Round-5g tests: KMV sketch + theta-framework intersection estimate."""

from __future__ import annotations

import hashlib

from kgx import sketch

SPACE = 1 << 60


def _h(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _ref_intersection(a_vals, b_vals, k):
    sa = sorted({_h(v) for v in a_vals})[:k]
    sb = sorted({_h(v) for v in b_vals})[:k]
    ta = sa[-1] if len(sa) == k else SPACE
    tb = sb[-1] if len(sb) == k else SPACE
    t = min(ta, tb)
    m = len([h for h in set(sa) & set(sb) if h < t])
    return t, m, float(m) * float(SPACE) / float(t)


def _df(spark, a_vals, b_vals):
    rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
    return spark.createDataFrame(rows, "event_type string, user_id long")


def test_kmv_sketch_keeps_k_smallest_distinct(spark):
    vals = list(range(20)) + list(range(10))  # duplicates collapse
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    got = sorted(
        r.hv for r in sketch.kmv_sketch(df, "v", ["g"], k=8).collect()
    )
    assert got == sorted({_h(v) for v in range(20)})[:8]


def test_kmv_intersection_exact_when_sketches_small(spark):
    # both groups below k -> theta = SPACE, estimate == exact count
    out = sketch.kmv_intersection(
        _df(spark, range(10), range(5, 15)), "user_id", "event_type",
        "A", "B", k=64,
    ).collect()[0]
    assert out.theta_t == SPACE
    assert out.n_matches == 5
    assert out.est_intersection == 5.0
    assert out.exact_intersection == 5


def test_kmv_intersection_sketch_path_matches_reference(spark):
    a, b = list(range(100)), list(range(60, 160))
    k = 16
    t, m, est = _ref_intersection(a, b, k)
    out = sketch.kmv_intersection(
        _df(spark, a, b), "user_id", "event_type", "A", "B", k=k
    ).collect()[0]
    assert (out.theta_t, out.n_matches) == (t, m)
    assert out.est_intersection == est
    assert out.exact_intersection == 40
    assert t < SPACE  # the sketch path actually engaged


# ------------------------------------------- content-defined chunking --


def _cdc_h(w) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:15], 16)


def _ref_cdc(text, divisor):
    toks = text.lower().strip().split()
    chunks, cur = [], []
    for w in toks:
        cur.append(w)
        if _cdc_h(w) % divisor == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (j, len(c), hashlib.md5(" ".join(c).encode()).hexdigest())
        for j, c in enumerate(chunks)
    ]


def test_cdc_matches_reference_python(spark):
    from kgx import curation

    texts = [
        "alpha order beta gamma merge delta",  # order/merge are boundaries
        "order",                               # single boundary token
        "no boundaries here at all",
        "merge merge merge",                   # every token a boundary
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = curation.cdc_chunks(df, divisor=8).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_tokens, r.chunk_hash))
    for i, t in enumerate(texts):
        assert sorted(got[i]) == _ref_cdc(t, 8), f"doc {i}"


def test_cdc_boundaries_survive_insertion(spark):
    # THE property fixed-size chunking lacks: one inserted token only
    # perturbs its own chunk; every other chunk hash still matches.
    from kgx import curation

    base = "one two three order four five merge six seven"
    edited = "one INSERTED two three order four five merge six seven"
    df = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    out = curation.cdc_chunks(df, divisor=8).collect()
    h1 = {r.chunk_hash for r in out if r.doc_id == 1}
    h2 = {r.chunk_hash for r in out if r.doc_id == 2}
    # chunks after the edit point ("four five merge", "six seven") and
    # the unaffected tail still dedup; only the edited chunk diverges
    assert len(h1 & h2) == 2
    assert len(h1) == 3 and len(h2) == 3


# ------------------------------------------- fact fusion ---------------


def test_fact_fusion_majority_tie_and_confidence(spark):
    from kgx import canonical

    rows = (
        [("u1", "p", "positive")] * 3
        + [("u1", "p", "negative")]
        + [("u2", "p", "positive")] * 2
        + [("u2", "p", "negative")] * 2   # tie -> smallest value wins
        + [("u3", "q", "neutral")]
    )
    df = spark.createDataFrame(
        rows, "subj_uri string, pred string, obj_polarity string"
    )
    got = {
        (r.subj_uri, r.pred): (
            r.fused_value, r.n_votes_winner, r.n_votes_total,
            r.n_alternatives, r.confidence,
        )
        for r in canonical.fact_fusion(df).collect()
    }
    assert got == {
        ("u1", "p"): ("positive", 3, 4, 2, 0.75),
        ("u2", "p"): ("negative", 2, 4, 2, 0.5),
        ("u3", "q"): ("neutral", 1, 1, 1, 1.0),
    }


def test_fact_provenance_distribution_and_sample(spark):
    from kgx import canonical

    rows = (
        [("c1", "u1", "p", "positive")] * 2
        + [("c2", "u1", "p", "negative"), ("c2", "u1", "p", "neutral")]
        + [(f"c{i}", "u2", "q", "positive") for i in range(1, 8)]
    )
    df = spark.createDataFrame(
        rows, "conv_id string, subj_uri string, pred string, obj_polarity string"
    )
    got = {
        (r.subj_uri, r.pred): (
            r.n_evidence, r.n_sources, r.n_pos, r.n_neg, r.n_neu,
            r.source_sample,
        )
        for r in canonical.fact_provenance(df).collect()
    }
    assert got == {
        ("u1", "p"): (4, 2, 2, 1, 1, "c1,c2"),
        # lexicographic first-5 of c1..c7
        ("u2", "q"): (7, 7, 7, 0, 0, "c1,c2,c3,c4,c5"),
    }


def test_snapshot_diff_all_four_statuses(spark):
    from kgx import canonical

    old = spark.createDataFrame(
        [("a", "p", "positive"), ("b", "p", "negative"), ("c", "p", "neutral")],
        "subj_uri string, pred string, fused_value string",
    )
    new = spark.createDataFrame(
        [("a", "p", "positive"), ("b", "p", "positive"), ("d", "p", "neutral")],
        "subj_uri string, pred string, fused_value string",
    )
    got = {
        (r.subj_uri, r.pred): (r.old_value, r.new_value, r.status)
        for r in canonical.snapshot_diff(old, new).collect()
    }
    assert got == {
        ("a", "p"): ("positive", "positive", "unchanged"),
        ("b", "p"): ("negative", "positive", "changed"),
        ("c", "p"): ("neutral", None, "removed"),
        ("d", "p"): (None, "neutral", "added"),
    }


def test_containment_asymmetric_subdoc(spark):
    from kgx import dedup

    base = " ".join(f"w{i}" for i in range(40))
    sub = " ".join(f"w{i}" for i in range(20))       # strict prefix
    other = " ".join(f"x{i}" for i in range(40))     # disjoint
    df = spark.createDataFrame(
        [(1, base), (2, sub), (3, other)], "doc_id long, text string"
    )
    got = {
        (r.src_id, r.dst_id): r.containment
        for r in dedup.containment_pairs(df, threshold=0.9).collect()
    }
    # sub→base containment exactly 1.0; base→sub (16/36 < 0.9) and all
    # pairs with the disjoint doc are absent
    assert got == {(2, 1): 1.0}


def test_mix_interleave_round_robin_positions(spark):
    from kgx import curation

    # A has 3 docs, B has 1, C has 2 — strict striding with drop-out:
    # cycle 0: A,B,C  cycle 1: A,C  cycle 2: A
    rows = [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "C"), (6, "C")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = curation.mix_interleave(df).collect()
    pos = {(r.source, r.rank_in_source): r.epoch_pos for r in out}
    assert pos == {
        ("A", 0): 0, ("B", 0): 1, ("C", 0): 2,
        ("A", 1): 3, ("C", 1): 4,
        ("A", 2): 5,
    }
    # epoch positions are a permutation of 0..n-1
    assert sorted(r.epoch_pos for r in out) == list(range(6))


def test_fusion_delta_log_replay_idempotent_and_equals_batch(spark, tmp_path):
    from kgx import canonical
    from kgx.streaming import fusion_stream

    b0 = spark.createDataFrame(
        [("u1", "p", "positive")] * 2 + [("u2", "p", "negative")],
        "subj_uri string, pred string, obj_polarity string",
    )
    b1 = spark.createDataFrame(
        [("u1", "p", "negative")] * 3 + [("u2", "p", "negative")],
        "subj_uri string, pred string, obj_polarity string",
    )
    votes = str(tmp_path / "votes")

    def write(batch_df, batch_id):
        fusion_stream.vote_delta(batch_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{votes}/batch={batch_id}")

    write(b0, 0)
    write(b0, 0)  # replayed micro-batch: same id overwrites, never adds
    write(b1, 1)

    got = {
        (r.subj_uri, r.pred): (r.fused_value, r.n_votes_winner, r.n_votes_total)
        for r in fusion_stream.read_fused(spark, votes).collect()
    }
    want = {
        (r.subj_uri, r.pred): (r.fused_value, r.n_votes_winner, r.n_votes_total)
        for r in canonical.fact_fusion(b0.unionByName(b1)).collect()
    }
    assert got == want
    assert got[("u1", "p")] == ("negative", 3, 5)


def test_entity_salience_share_and_rank(spark):
    from kgx import aggregate

    rows = [("c1", "e1")] * 3 + [("c1", "e2")] * 1 + [("c2", "e9")]
    df = spark.createDataFrame(rows, "conv_id string, subj_uri string")
    got = {
        (r.conv_id, r.subj_uri): (r.n_mentions, r.n_doc_mentions, r.salience, r.rank)
        for r in aggregate.entity_salience(df).collect()
    }
    assert got == {
        ("c1", "e1"): (3, 4, 0.75, 1),
        ("c1", "e2"): (1, 4, 0.25, 2),
        ("c2", "e9"): (1, 1, 1.0, 1),
    }


def test_correlation_exact_and_degenerate(spark):
    from kgx import stats

    rows = [
        ("g1", 1.0, 2.0), ("g1", 2.0, 4.0), ("g1", 3.0, 6.0),  # perfect
        ("g2", 1.0, 5.0), ("g2", 1.0, 7.0),                    # zero x-var
        ("g3", 1.0, 1.0), ("g3", 2.0, None),                   # null drops
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: (r.n, r.pearson_r, r.ols_slope)
           for r in stats.correlation(df, "g", "x", "y").collect()}
    assert got["g1"] == (3, 1.0, 2.0)
    assert got["g2"][0] == 2 and got["g2"][1] is None and got["g2"][2] is None
    # g3: single complete pair -> degenerate, NULL r
    assert got["g3"] == (1, None, None)


# --------------------------------------- exif / modularity / ppl band --


def test_exif_roundtrip_both_byte_orders_and_absence():
    from kgx import multimodal as m

    for little in (False, True):
        for o in range(1, 9):
            b = m.make_jpeg_exif(40, 30, o, little)
            assert m.parse_exif_orientation(b) == o
            # dims parser skips APP1 and still reads SOF0
            assert m.parse_image_header(b) == (40, 30, "jpeg")
    assert m.parse_exif_orientation(m.make_jpeg(10, 10)) is None
    assert m.parse_exif_orientation(m.make_png(5, 5)) is None
    assert m.parse_exif_orientation(b"\xff\xd8\xff\xe1\x00\x04Ex") is None


def test_modularity_two_cliques_exact(spark):
    from kgx import graph

    # two triangles joined by one bridge edge; communities = the triangles
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("d", "e"), ("e", "f"), ("d", "f")]
    bridge = [("c", "d")]
    e0 = tri1 + tri2 + bridge
    und = spark.createDataFrame(
        e0 + [(y, x) for x, y in e0], "src string, dst string"
    )
    comm = spark.createDataFrame(
        [(n, "t1") for n in "abc"] + [(n, "t2") for n in "def"],
        "node string, community string",
    )
    got = {r.community: (r.n_nodes, r.intra_und, r.k_c, r.contribution)
           for r in graph.modularity(und, comm).collect()}
    # 2m = 14; each triangle: intra_und 6, k_c 7
    # contribution = (14*6 - 49) / 196 = 35/196
    assert got == {
        "t1": (3, 6, 7, 35.0 / 196.0),
        "t2": (3, 6, 7, 35.0 / 196.0),
    }
    # global Q for this classic split is 5/14
    q = sum(v[3] for v in got.values())
    assert abs(q - 5.0 / 14.0) < 1e-15


def test_ppl_band_thirds_per_lang(spark):
    from kgx import curation

    docs = spark.createDataFrame(
        [(i, "en") for i in range(1, 8)] + [(10, "fr"), (11, "fr")],
        "doc_id long, lang string",
    )
    scored = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(1, 8)]
        + [(10, 5.0), (11, 9.0)],
        "doc_id long, unigram_likelihood double",
    )
    got = {r.doc_id: (r.ppl_rank, r.bucket)
           for r in curation.ppl_band(docs, scored).collect()}
    # en: n=7 -> head r<=2, middle r<=4, tail r>=5 (scores desc = id asc)
    assert got[1] == (1, "head") and got[2] == (2, "head")
    assert got[3] == (3, "middle") and got[4] == (4, "middle")
    assert got[5] == (5, "tail") and got[7] == (7, "tail")
    # fr: n=2 -> n div 3 = 0 -> no head; r=1 middle, r=2 tail
    assert got[11] == (1, "middle") and got[10] == (2, "tail")


def test_fusion_stream_kill_resume_equals_single_run(spark, tmp_path):
    """Mid-corpus kill+resume for the foreachBatch fusion stream: stop
    after the first committed micro-batch, restart from the same
    checkpoint with availableNow, and assert the fused table equals the
    uninterrupted run — checkpoint offsets + the batch-keyed delta-log
    overwrite are what make the restart exactly-once."""
    import os as _os
    import pandas as pd

    from kgx import canonical
    from kgx.streaming import fusion_stream

    frames = [
        pd.DataFrame({"subj_uri": ["u1"] * 2 + ["u2"],
                      "pred": ["p"] * 3,
                      "obj_polarity": ["positive", "positive", "negative"]}),
        pd.DataFrame({"subj_uri": ["u1"] * 3 + ["u2"],
                      "pred": ["p"] * 4,
                      "obj_polarity": ["negative"] * 3 + ["negative"]}),
        pd.DataFrame({"subj_uri": ["u3"], "pred": ["q"],
                      "obj_polarity": ["neutral"]}),
    ]
    import sys
    sys.path.insert(0, _os.path.join(_os.path.dirname(__file__)))
    from test_round5 import _drain_with_restart, _write_batches

    def run(tag, restart):
        base = str(tmp_path / tag)
        src = f"{base}/src"
        _write_batches(src, frames)
        votes, ckpt = f"{base}/votes", f"{base}/ckpt"

        def start(available_now):
            source = (
                spark.readStream.schema(
                    "subj_uri string, pred string, obj_polarity string"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{src}/*")
            )
            return fusion_stream.start_fusion_stream(
                spark, source, votes, ckpt, available_now=available_now
            )

        _drain_with_restart(spark, start, ckpt, restart)
        return {
            (r.subj_uri, r.pred): (r.fused_value, r.n_votes_winner,
                                   r.n_votes_total)
            for r in fusion_stream.read_fused(spark, votes).collect()
        }

    single = run("single", restart=False)
    resumed = run("resumed", restart=True)
    assert single == resumed
    # and both equal batch fusion over the union
    allpdf = pd.concat(frames)
    batch = {
        (r.subj_uri, r.pred): (r.fused_value, r.n_votes_winner, r.n_votes_total)
        for r in canonical.fact_fusion(
            spark.createDataFrame(allpdf)
        ).collect()
    }
    assert single == batch
    assert batch[("u1", "p")] == ("negative", 3, 5)
