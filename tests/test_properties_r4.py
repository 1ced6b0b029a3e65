"""Round-4 property tests (hypothesis): media header parsers are exact
inverses of the fixture builders over their whole parameter domains, never
crash on arbitrary bytes, and the OWL rendering round-trips arbitrary
KnowledgeBases — including canonical names that are not surface forms and
XML-special characters (the regression class fixed in round 4)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgx import multimodal as mm
from kgx import resources


# ---------------------------------------------------------------------------
# header parsers: builder → parser identity + total-function safety
# ---------------------------------------------------------------------------

dims = st.integers(min_value=1, max_value=65_000)


@settings(max_examples=60, deadline=None)
@given(w=dims, h=dims, fmt=st.sampled_from(["png", "gif", "jpeg"]))
def test_image_header_roundtrip(w, h, fmt):
    payload = {"png": mm.make_png, "gif": mm.make_gif, "jpeg": mm.make_jpeg}[fmt](w, h)
    got_w, got_h, got_fmt = mm.parse_image_header(payload)
    assert (got_w, got_h, got_fmt) == (w, h, fmt)


@settings(max_examples=60, deadline=None)
@given(
    sr=st.integers(min_value=1, max_value=384_000),
    n=st.integers(min_value=0, max_value=10_000_000),
    ch=st.integers(min_value=1, max_value=8),
    bits=st.sampled_from([8, 16, 24, 32]),
)
def test_wav_header_roundtrip(sr, n, ch, bits):
    payload = mm.make_wav(sr, n, channels=ch, bits=bits)
    dur, got_sr, got_ch, got_bits = mm.parse_wav_header(payload)
    assert (got_sr, got_ch, got_bits) == (sr, ch, bits)
    assert dur == (n * 1000) // sr  # builder semantics: floor milliseconds


@settings(max_examples=60, deadline=None)
@given(
    dur=st.integers(min_value=0, max_value=2**31 - 1),
    ts=st.integers(min_value=1, max_value=1_000_000),
    v1=st.booleans(),
)
def test_mp4_header_roundtrip(dur, ts, v1):
    payload = mm.make_mp4(dur, timescale=ts, v1=v1)
    got_dur, got_ts, brand = mm.parse_mp4_header(payload)
    assert got_ts == ts
    assert brand is not None
    # builder takes duration in ms and writes ticks = dur*ts//1000; the
    # parser returns ms = ticks*1000//ts — a floor of a floor, never larger
    assert got_dur == ((dur * ts) // 1000) * 1000 // ts
    assert 0 <= dur - got_dur <= max(1000 // ts, 1) + 1000 // max(ts, 1)


@settings(max_examples=120, deadline=None)
@given(junk=st.binary(max_size=256))
def test_parsers_never_raise_on_junk(junk):
    """Corrupt payloads must yield NULL fields, never exceptions — a task
    that dies on one bad blob kills the whole 100-TB scan."""
    for fn in (mm.parse_image_header, mm.parse_wav_header, mm.parse_mp4_header):
        fn(junk)  # any return is fine; raising is the failure
        fn(None)


# ---------------------------------------------------------------------------
# OWL round-trip over arbitrary KBs
# ---------------------------------------------------------------------------

# XML-valid text that exercises escaping: letters, digits, XML specials,
# quotes, unicode — no control chars (invalid in XML 1.0), no leading/
# trailing whitespace (RDF literals get stripped by the loader)
_text = (
    st.text(
        alphabet=st.sampled_from(
            list("abcXYZ09&<>\"'|; ré€αΩ")
        ),
        min_size=1,
        max_size=12,
    )
    .map(lambda s: s.strip())
    .filter(lambda s: s)
)
_ident = st.text(alphabet=st.sampled_from(list("abcdefXYZ09")), min_size=1, max_size=8)


@st.composite
def _kbs(draw):
    n_ent = draw(st.integers(min_value=1, max_value=4))
    gaz = []
    for i in range(n_ent):
        uri = f"http://kgx.example.org/onto#e{i}_{draw(_ident)}"
        name = draw(_text)  # deliberately NOT constrained to the surfaces
        etype = draw(st.sampled_from(["Company", "Stock", "Topic"]))
        surfaces = draw(
            st.lists(_text, min_size=1, max_size=3, unique=True)
        )
        for s in surfaces:
            gaz.append((uri, name, etype, s))
    lex = [
        (draw(_text).lower(), pol)
        for pol in ("positive", "negative")
    ]
    inds = []
    if draw(st.booleans()):
        inds.append(
            (
                "http://kgx.example.org/onto#ind_" + draw(_ident),
                draw(_text),  # canonical indicator name, not a surface
                draw(_text),
                "Macro",
                draw(st.sampled_from([-1, 1])),
                "Company",
                "price",
            )
        )
    return resources.KnowledgeBase(
        gazetteer=gaz,
        lexicon=lex,
        indicators=inds,
        feature_alias=[("cost", "price")],
        feature_surfaces=[("price", "price")],
    )


@settings(max_examples=40, deadline=None)
@given(kb=_kbs())
def test_owl_roundtrip_arbitrary_kb(kb, tmp_path_factory):
    """load_owl(save_owl(kb)) == kb up to exact-duplicate rows, for KBs with
    XML-special characters and canonical names disjoint from surfaces."""
    from kgx import owl

    path = str(tmp_path_factory.mktemp("owlprop") / "kb.owl")
    owl.save_owl(kb, path)
    kb2 = owl.load_owl(path)
    for dim in ("gazetteer", "lexicon", "indicators", "feature_alias", "feature_surfaces"):
        assert sorted(set(getattr(kb, dim))) == sorted(set(getattr(kb2, dim))), dim


# ---------------------------------------------------------------------------
# streaming carryover emitter: property parity with an independent model
# ---------------------------------------------------------------------------

_ENTS = ["spark", "customer", "vector", "stream", "window"]


@settings(max_examples=80, deadline=None)
@given(
    turns=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # turn_idx (dups allowed)
            st.lists(st.sampled_from(_ENTS), max_size=3),  # SO surfaces
        ),
        min_size=0,
        max_size=15,
    )
)
def test_stream_carry_rows_matches_model(turns):
    from kgx.streaming.carryover_stream import _carry_rows

    idxs = [t for (t, _e) in turns]
    sets = ["|".join(sorted(set(e))) for (_t, e) in turns]

    # independent model: dedup turn_idx by min joined-set string, walk turns
    # ascending carrying the last non-empty set
    best: dict = {}
    for i, s in sorted(zip(idxs, sets), key=lambda p: (p[0], p[1])):
        best.setdefault(i, s)
    want = set()
    src, ents = None, None
    for i in sorted(best):
        cur = [e for e in best[i].split("|") if e]
        if cur:
            src, ents = i, cur
        if ents is None:
            continue
        for e in ents:
            want.add((i, e, src, src != i))

    got = {
        (r.turn_idx, r.entity, r.src_turn_idx, r.carried)
        for r in _carry_rows("c", idxs, sets).itertuples()
    }
    assert got == want
