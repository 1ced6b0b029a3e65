"""Differential oracle: a single-threaded pure-Python reimplementation of
the extraction semantics (SURVEY.md §5 item 3).

Deliberately independent of the kgx Spark code — its own matcher (scan-based,
not the pipeline's combined regex) and its own arithmetic — so that a bug in
the pipeline is not mirrored here. Compares on semantic triple identity
(conv, turn, level, subj name/uri/type, pred, polarity, score, classifier,
dom label, indicator), never on internal hash ids.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_EVEN, Decimal

import pandas as pd

from kgx.resources import (
    CLS_HYBRID_FUZZY,
    CLS_KNOWLEDGE_BASED,
    CLS_POSNEG_RATIO,
    DOM_BOUNDS,
    PRED_REPUTATION,
    KnowledgeBase,
)

_NS = "http://kgx.example.org/onto#"
_Q16 = Decimal("1e-16")


def _dec16(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(_Q16, rounding=ROUND_HALF_EVEN)


def _is_word_char(c: str) -> bool:
    return c.isalnum() or c == "_"


def _find_occurrences(text_lc: str, surface_lc: str) -> list[tuple[int, int]]:
    """All word-boundary occurrences of surface in text (both lowercased)."""
    out = []
    start = 0
    n = len(surface_lc)
    while True:
        i = text_lc.find(surface_lc, start)
        if i < 0:
            break
        j = i + n
        ok_l = i == 0 or not (_is_word_char(text_lc[i - 1]) and _is_word_char(surface_lc[0]))
        ok_r = j == len(text_lc) or not (
            _is_word_char(text_lc[j - 1]) and _is_word_char(text_lc[j])
        )
        if ok_l and ok_r:
            out.append((i, j))
        start = i + 1
    return out


def _canon_type(t: str) -> str:
    return "Stock" if "Stock" in t else t


class Oracle:
    def __init__(self, kb: KnowledgeBase, max_text_len: int = 1_000_000):
        self.max_text_len = max_text_len
        # kind per lowercase surface; SO > Indicator > Feature on identical
        # surface strings (mirrors the documented contract)
        self.kind_of: dict[str, str] = {}
        for s, _c in kb.feature_surfaces:
            self.kind_of.setdefault(s.lower(), "Feature")
        for row in kb.indicators:
            self.kind_of[row[2].lower()] = "Indicator"
        for (_u, _n, _t, s) in kb.gazetteer:
            self.kind_of[s.lower()] = "SO"
        self.polarity_of = {t.lower(): p for (t, p) in kb.lexicon}

        # gazetteer first-wins per surface: min (uri, name)
        gaz: dict[str, tuple] = {}
        for (u, n, t, s) in kb.gazetteer:
            k = s.lower()
            cand = (u, n, _canon_type(t))
            if k not in gaz or (cand[0], cand[1]) < (gaz[k][0], gaz[k][1]):
                gaz[k] = cand
        self.gazetteer = gaz

        ind: dict[str, tuple] = {}
        for (u, n, s, it, corr, ocls, feat) in kb.indicators:
            k = s.lower()
            if k not in ind or u < ind[k][0]:
                ind[k] = (u, n, it, corr, ocls, feat)
        self.indicators = ind

        self.feature_canon = {a.lower(): c for (a, c) in kb.feature_alias}
        for (s, c) in kb.feature_surfaces:
            self.feature_canon.setdefault(s.lower(), c)

    # -- matching -----------------------------------------------------------

    def match_turn(self, text: str) -> dict:
        text_lc = text.lower()
        cands: list[tuple[int, int, str]] = []  # begin, end, surface_lc
        for s in self.kind_of:
            for (b, e) in _find_occurrences(text_lc, s):
                cands.append((b, e, s))
        # leftmost-longest, non-overlapping
        cands.sort(key=lambda x: (x[0], -(x[1])))
        chosen: list[tuple[int, int, str]] = []
        last_end = -1
        for (b, e, s) in cands:
            if b >= last_end:
                chosen.append((b, e, s))
                last_end = e
        entity_spans = [(b, e) for (b, e, _s) in chosen]

        pos = neg = 0
        for term, pol in self.polarity_of.items():
            for (b, e) in _find_occurrences(text_lc, term):
                if any(b < se and sb < e for (sb, se) in entity_spans):
                    continue
                if pol == "positive":
                    pos += 1
                else:
                    neg += 1

        so, inds, feats = [], [], []
        for (b, e, s) in chosen:
            kind = self.kind_of[s]
            if kind == "SO":
                so.append((b, text[b:e]))
            elif kind == "Indicator":
                inds.append((b, text[b:e]))
            else:
                feats.append((b, text[b:e]))
        feats.sort()
        first_feat = feats[0][1] if feats else None
        sub = None
        if first_feat is not None:
            for (_b, fsurf) in feats[1:]:
                if fsurf.lower() != first_feat.lower():
                    sub = fsurf
                    break
        return {
            "pos": pos,
            "neg": neg,
            "so": so,
            "ind": inds,
            "first_feature": first_feat,
            "subfeature": sub,
        }

    # -- pipeline -------------------------------------------------------------

    def run(self, transcripts: pd.DataFrame) -> pd.DataFrame:
        """Returns the expected triples as a pandas DataFrame with the
        semantic identity columns."""
        df = transcripts[transcripts["text"].str.len() <= self.max_text_len]
        df = df.drop_duplicates(["conv_id", "turn_idx"])

        sent_rows = []  # semantic sentence facts
        conv_turn_counts: dict[str, list] = defaultdict(list)
        conv_has_so: dict[str, bool] = defaultdict(bool)
        conv_day: dict[str, object] = {}

        facts = []  # (conv, turn, name, uri, type, pred, sub, score_i, ind_uri)
        for row in df.itertuples(index=False):
            m = self.match_turn(row.text)
            day = pd.Timestamp(row.ts).date()
            if row.conv_id not in conv_day or day < conv_day[row.conv_id]:
                conv_day[row.conv_id] = day
            conv_turn_counts[row.conv_id].append((m["pos"], m["neg"]))
            turn_score = (m["pos"] > m["neg"]) - (m["pos"] < m["neg"])

            # link + dedup SO per (lower name, uri)
            linked = {}
            for (_b, surf) in m["so"]:
                g = self.gazetteer.get(surf.lower())
                if g is None:
                    key = (surf.lower(), None)
                    val = (surf, None, "unknown")
                else:
                    uri, name, typ = g
                    key = (name.lower(), uri)
                    val = (name, uri, typ)
                if key not in linked:
                    linked[key] = val
            if m["so"]:
                conv_has_so[row.conv_id] = True  # routing P1: raw SO mention

            pred = self.feature_canon.get(
                (m["first_feature"] or "").lower(), PRED_REPUTATION
            )
            sub = (
                self.feature_canon.get(m["subfeature"].lower())
                if m["subfeature"] is not None
                else None
            )
            for (name, uri, typ) in linked.values():
                if typ == "unknown":
                    continue
                facts.append(
                    (row.conv_id, row.turn_idx, name, uri, typ, pred, sub, turn_score, None)
                )

            # indirect: dedup indicator per turn by uri
            seen_ind = {}
            for (_b, surf) in m["ind"]:
                d = self.indicators.get(surf.lower())
                if d is not None and d[0] not in seen_ind:
                    seen_ind[d[0]] = d
            for (iuri, _iname, _it, corr, ocls, feat) in seen_ind.values():
                eff = turn_score * corr
                targets = [
                    v for v in linked.values() if v[2] == ocls
                ]
                if not targets:
                    targets = [(ocls, _NS + ocls, ocls)]
                for (name, uri, typ) in targets:
                    facts.append(
                        (row.conv_id, row.turn_idx, name, uri, typ, feat, None, eff, iuri)
                    )

        # sentence triples
        for (conv, turn, name, uri, typ, pred, sub, s, iuri) in facts:
            sent_rows.append(
                dict(
                    conv_id=conv,
                    turn_idx=turn,
                    level="sentence",
                    subj_name=name,
                    subj_uri=uri,
                    subj_type=typ,
                    pred=pred,
                    subfeature=sub,
                    obj_polarity="positive" if s > 0 else ("negative" if s < 0 else "neutral"),
                    score=_dec16(float(s)),
                    classifier=CLS_KNOWLEDGE_BASED,
                    dom_label=None,
                    indicator_uri=iuri,
                )
            )

        # document-level per (conv, lower name, pred)
        groups: dict[tuple, dict] = {}
        for (conv, turn, name, uri, typ, pred, _sub, s, _iuri) in facts:
            k = (conv, name.lower(), pred)
            g = groups.setdefault(
                k, {"pos": 0, "neg": 0, "first": (turn, name, uri, typ)}
            )
            if s > 0:
                g["pos"] += 1
            elif s < 0:
                g["neg"] += 1
            if (turn, name) < (g["first"][0], g["first"][1]):
                g["first"] = (turn, name, uri, typ)

        doc_rows = []
        for (conv, _nl, pred), g in groups.items():
            tot = g["pos"] + g["neg"]
            if tot == 0:
                continue
            dscore = (g["pos"] - g["neg"]) / tot
            _t, name, uri, typ = g["first"]
            base = dict(
                conv_id=conv,
                turn_idx=None,
                level="document",
                subj_name=name,
                subj_uri=uri,
                subj_type=typ,
                pred=pred,
                subfeature=None,
                obj_polarity="positive" if dscore > 0 else "negative",
                score=_dec16(dscore),
                indicator_uri=None,
            )
            doc_rows.append(dict(base, classifier=CLS_KNOWLEDGE_BASED, dom_label=None))
            doc_rows.append(
                dict(base, classifier=CLS_HYBRID_FUZZY, dom_label=_dom(abs(dscore)))
            )

        # fallback A1
        fb_rows = []
        for conv, counts in conv_turn_counts.items():
            if conv_has_so[conv]:
                continue
            pos = sum(p for (p, _n) in counts)
            neg = sum(n for (_p, n) in counts)
            if pos + neg == 0:
                continue
            dscore = (pos - neg) / (pos + neg)
            fb_rows.append(
                dict(
                    conv_id=conv,
                    turn_idx=None,
                    level="document",
                    subj_name=conv,
                    subj_uri=None,
                    subj_type="Document",
                    pred=PRED_REPUTATION,
                    subfeature=None,
                    obj_polarity="positive" if dscore > 0 else ("negative" if dscore < 0 else "neutral"),
                    score=_dec16(dscore),
                    classifier=CLS_POSNEG_RATIO,
                    dom_label=None,
                    indicator_uri=None,
                )
            )

        out = pd.DataFrame(sent_rows + doc_rows + fb_rows)
        return out


def _dom(s: float) -> str:
    for label, lo, hi, _avg in DOM_BOUNDS:
        if lo <= s < hi:
            return label
    if s >= 1.0:
        return DOM_BOUNDS[-1][0]
    return "n/a"
