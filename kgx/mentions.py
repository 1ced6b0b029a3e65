"""Stage 2 — Arrow pandas-UDF mention detection.

Replaces the reference's GATE preprocessing pipeline (tokenizer + sentence
splitter + ontology gazetteer; selected by Preprocessing_UHOH.gapp,
GlobalParameters.java:53-69) and its annotation-set selects
(doc.getAnnotations("Sentiment_Object"/"OrientationTerm"/"Indicator"),
SentimentClassification.java:150,380,429,473,500).

Contract (the ONLY Python stage in the hot path — Arrow-batched, never
per-row):

    detect_mentions(text: Series[str]) -> Series[array<struct<
        begin:int, end:int, kind:string, surface:string,
        feats:map<string,string>>>]

Matching semantics (shared with the pure-Python oracle in tests/oracle.py):
  * gazetteer / indicator / feature surfaces: leftmost-longest,
    case-insensitive, word-boundary delimited, via one combined alternation
    regex ordered by surface length desc (Aho-Corasick drop-in documented
    for >10^5 surfaces);
  * orientation terms: word-boundary matches that do NOT overlap a
    gazetteer/indicator/feature span (span-overlap rule, FIXTURES.md §3);
    each occurrence counts (A1 counts annotations with multiplicity,
    WorkerThread.java:130-139).

The matcher is compiled lazily once per Python worker from broadcast
surface lists — the Spark analogue of per-thread duplicated GATE
controllers (CompletePipelineWorker.java:420-423).
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kgx import schema
from kgx.resources import KnowledgeBase


class SurfaceMatcher:
    """Regex-based leftmost-longest multi-pattern matcher."""

    def __init__(
        self,
        so_surfaces: Iterable[str],
        indicator_surfaces: Iterable[str],
        feature_surfaces: Iterable[str],
        pos_terms: Iterable[str],
        neg_terms: Iterable[str],
    ) -> None:
        self.kind_of: dict[str, str] = {}
        for s in feature_surfaces:
            self.kind_of.setdefault(s.lower(), "Feature")
        for s in indicator_surfaces:
            self.kind_of[s.lower()] = "Indicator"
        for s in so_surfaces:
            self.kind_of[s.lower()] = "SO"  # SO wins ties with feature/indicator
        entity_pats = sorted(self.kind_of, key=len, reverse=True)
        self.entity_re = (
            re.compile(
                r"(?<!\w)(" + "|".join(re.escape(p) for p in entity_pats) + r")(?!\w)",
                re.IGNORECASE,
            )
            if entity_pats
            else None
        )
        self.polarity_of = {t.lower(): "positive" for t in pos_terms}
        self.polarity_of.update({t.lower(): "negative" for t in neg_terms})
        terms = sorted(self.polarity_of, key=len, reverse=True)
        self.term_re = (
            re.compile(
                r"(?<!\w)(" + "|".join(re.escape(t) for t in terms) + r")(?!\w)",
                re.IGNORECASE,
            )
            if terms
            else None
        )

    def match(self, text: str) -> list[dict]:
        out: list[dict] = []
        spans: list[tuple[int, int]] = []
        if self.entity_re is not None:
            for m in self.entity_re.finditer(text):
                surface = m.group(1)
                kind = self.kind_of[surface.lower()]
                spans.append((m.start(1), m.end(1)))
                out.append(
                    {
                        "begin": m.start(1),
                        "end": m.end(1),
                        "kind": kind,
                        "surface": surface,
                        "feats": {},
                    }
                )
        if self.term_re is not None:
            for m in self.term_re.finditer(text):
                b, e = m.start(1), m.end(1)
                if any(b < se and sb < e for sb, se in spans):
                    continue  # inside an entity/indicator/feature span
                out.append(
                    {
                        "begin": b,
                        "end": e,
                        "kind": "OrientationTerm",
                        "surface": m.group(1),
                        "feats": {"polarity": self.polarity_of[m.group(1).lower()]},
                    }
                )
        out.sort(key=lambda d: (d["begin"], -(d["end"])))
        return out


def matcher_from_kb(kb: KnowledgeBase) -> SurfaceMatcher:
    return SurfaceMatcher(
        so_surfaces=[s for (_u, _n, _t, s) in kb.gazetteer],
        indicator_surfaces=[row[2] for row in kb.indicators],
        feature_surfaces=[s for (s, _c) in kb.feature_surfaces],
        pos_terms=[t for (t, p) in kb.lexicon if p == "positive"],
        neg_terms=[t for (t, p) in kb.lexicon if p == "negative"],
    )


def detect_mentions(turns: DataFrame, kb: KnowledgeBase) -> DataFrame:
    """Append a `mentions` array column to the turn table. No shuffle."""
    spark = turns.sparkSession
    sc = spark.sparkContext
    kb_bc = sc.broadcast(
        {
            "so": [s for (_u, _n, _t, s) in kb.gazetteer],
            "ind": [row[2] for row in kb.indicators],
            "feat": [s for (s, _c) in kb.feature_surfaces],
            "pos": [t for (t, p) in kb.lexicon if p == "positive"],
            "neg": [t for (t, p) in kb.lexicon if p == "negative"],
        }
    )

    state: dict = {}

    @F.pandas_udf(schema.MENTIONS_COL)
    def _detect(text: pd.Series) -> pd.Series:
        matcher = state.get("m")
        if matcher is None:
            d = kb_bc.value
            matcher = SurfaceMatcher(d["so"], d["ind"], d["feat"], d["pos"], d["neg"])
            state["m"] = matcher
        return text.map(lambda t: matcher.match(t) if isinstance(t, str) else [])

    return turns.withColumn("mentions", _detect(F.col("text")))
