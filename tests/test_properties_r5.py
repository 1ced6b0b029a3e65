"""Round-5 closing property tests (hypothesis), pure-Python domains only
(no SparkSession — the per-example cost must stay sub-millisecond):

* the Exif builder→parser pair is an exact inverse over its whole
  parameter domain in BOTH byte orders, and the parser is a total
  function on arbitrary byte strings (never raises, never returns an
  out-of-domain value);
* the closed-form round-robin interleave position used by
  curation.mix_interleave is a bijection onto 0..n-1 and respects the
  strict striding order for ANY multiset of source sizes — the formula
  is verified against a literal round-robin simulation;
* majority-vote fusion invariants over arbitrary vote multisets: the
  winner's count is maximal, ties break to the smallest value, and
  confidence is winner/total (checked against a pure-Python recount).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from kgx import multimodal as mm

dims = st.integers(min_value=1, max_value=65_000)


@settings(max_examples=80, deadline=None)
@given(w=dims, h=dims, o=st.integers(min_value=1, max_value=8), little=st.booleans())
def test_exif_roundtrip_property(w, h, o, little):
    payload = mm.make_jpeg_exif(w, h, o, little=little)
    assert mm.parse_exif_orientation(payload) == o
    assert mm.parse_image_header(payload) == (w, h, "jpeg")


@settings(max_examples=120, deadline=None)
@given(raw=st.binary(max_size=300))
def test_exif_parser_total_on_arbitrary_bytes(raw):
    got = mm.parse_exif_orientation(raw)
    assert got is None or isinstance(got, int)


@settings(max_examples=120, deadline=None)
@given(raw=st.binary(max_size=300))
def test_exif_parser_total_on_jpeg_prefixed_bytes(raw):
    got = mm.parse_exif_orientation(b"\xff\xd8" + raw)
    assert got is None or isinstance(got, int)


# ---------------------------------------------------------------------------
# mix_interleave closed form  ==  literal round-robin simulation
# ---------------------------------------------------------------------------


def _closed_form_pos(sizes: dict, source: str, r: int) -> int:
    """The formula mix_interleave evaluates per row (sum over the
    broadcast size dim): docs of earlier cycles from every source, plus
    same-cycle docs of lexicographically earlier still-live sources."""
    return sum(min(r, n) for n in sizes.values()) + sum(
        1 for s2, n in sizes.items() if s2 < source and n > r
    )


@settings(max_examples=100, deadline=None)
@given(
    sizes=st.dictionaries(
        st.sampled_from(list("abcdefg")),
        st.integers(min_value=1, max_value=12),
        min_size=1,
        max_size=7,
    )
)
def test_interleave_closed_form_matches_simulation(sizes):
    # literal striding: cycle r emits (source, r) for every source with
    # n > r, sources in lexicographic order
    sim = []
    for r in range(max(sizes.values())):
        for s in sorted(sizes):
            if sizes[s] > r:
                sim.append((s, r))
    total = sum(sizes.values())
    assert len(sim) == total
    for pos, (s, r) in enumerate(sim):
        assert _closed_form_pos(sizes, s, r) == pos
    # bijection onto 0..n-1
    all_pos = {
        _closed_form_pos(sizes, s, r) for s in sizes for r in range(sizes[s])
    }
    assert all_pos == set(range(total))


# ---------------------------------------------------------------------------
# fusion invariants vs a pure-Python recount
# ---------------------------------------------------------------------------


def _fuse(votes: list) -> tuple:
    c = Counter(votes)
    winner = min(c, key=lambda v: (-c[v], v))  # max count, ties to smallest
    return winner, c[winner], len(votes), len(c)


@settings(max_examples=100, deadline=None)
@given(votes=st.lists(st.sampled_from(["negative", "neutral", "positive"]),
                      min_size=1, max_size=40))
def test_fusion_pick_matches_oracle_sql_semantics(votes):
    """Two independent implementations of the fusion pick — the
    Counter-based recount above and the ORACLE's row_number-over-counts
    SQL (the same ORDER BY n DESC, value text KG_FUSION_SQL uses),
    executed by DuckDB per example — must agree on winner, counts and
    alternatives for every vote multiset."""
    import duckdb
    import pandas as pd

    winner, n_win, n_tot, n_alt = _fuse(votes)
    tbl = pd.DataFrame({"obj_polarity": votes})  # noqa: F841 (duckdb scan)
    row = duckdb.sql(
        """
        WITH v AS (SELECT obj_polarity, count(*) AS n FROM tbl GROUP BY 1)
        SELECT obj_polarity, n,
               (SELECT sum(n) FROM v) AS tot,
               (SELECT count(*) FROM v) AS alts
        FROM v
        QUALIFY row_number() OVER (ORDER BY n DESC, obj_polarity) = 1
        """
    ).fetchone()
    assert (row[0], row[1], row[2], row[3]) == (winner, n_win, n_tot, n_alt)
