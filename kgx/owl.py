"""S9 ontology ingestion: OWL / RDF-XML file → KnowledgeBase dimensions.

The reference loads its knowledge from a versioned RDF/XML ontology at
worker start (WeblogTag.java:83-116, resources/ontology/FIRSTOntology.owl)
and drives gazetteer annotation from the ontology's rdfs:labels. This
module is the missing ingestion edge for a user holding such a file: a
driver-side ``xml.etree`` flattener from the RDF/XML class/individual
graph into the same dimension frames ``resources.load_knowledge`` builds
from TSV/parquet snapshots. Driver-side on purpose — ontologies are a few
thousand statements; the dims are always broadcast, never read distributed.

Recognized shapes (all occur in FIRST-style ontologies; the test fixture
exercises each with ORIGINAL content — nothing is copied from the GPL
ontology):

  * ``owl:Class rdf:about`` with ``rdfs:subClassOf`` as either an
    ``rdf:resource`` attribute or a nested class element;
  * ``owl:NamedIndividual`` with ``rdf:type`` resources and any number of
    ``rdfs:label`` literals (surface forms, document order preserved);
  * RDF/XML *typed node* syntax — ``<ns:SomeClass rdf:about=...>`` where
    the element tag IS the rdf:type (used by FIRST for indicators and
    correlation definitions), including OWL punning (a resource that is
    both class and individual);
  * correlation-definition nodes linking indicators to an influenced
    object class, an influenced feature, and a polarity boolean
    (FIRSTOntology.owl:4223-4234 shape).

Classification is by ancestry walk over subClassOf ∪ rdf:type:

  gazetteer   — labeled resources under the SentimentObject root; the
                entity_type is the immediate type (individuals) or parent
                (classes) local name, preserving subtype names so the
                downstream "Stock" canonicalization rule
                (SentimentClassification.java:214-216) still sees them
  lexicon     — labels under the positive/negative orientation roots
  indicators  — individuals under Indicator* classes, joined to their
                correlation definitions (polarity, object class, feature)
  feature_surfaces — labels of ObjectFeature subclasses
  feature_alias    — labels of AliasDefinition nodes (case preserved)

``save_owl`` writes the inverse rendering so any KnowledgeBase can be
shipped as one self-contained ontology file; load_owl∘save_owl is
identity on every dimension up to exact-duplicate rows (RDF describes a
set of statements, so duplicate (uri, surface) rows collapse to one).
Canonical names ride an explicit ``kgx:canonicalName`` literal — NOT
labels[0] — so a KB whose display name is not its first surface form
round-trips unchanged (pytest-pinned for the full default KB and a
name≠surface KB).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

from kgx import resources

_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDFS = "http://www.w3.org/2000/01/rdf-schema#"
_OWL = "http://www.w3.org/2002/07/owl#"
_ABOUT = f"{{{_RDF}}}about"
_RESOURCE = f"{{{_RDF}}}resource"
_TYPE = f"{{{_RDF}}}type"
_LABEL = f"{{{_RDFS}}}label"
_SUBCLASS = f"{{{_RDFS}}}subClassOf"
# element tags that are RDF/OWL structure, not typed nodes
_VOCAB_TAGS = {
    f"{{{_OWL}}}Class",
    f"{{{_OWL}}}NamedIndividual",
    f"{{{_OWL}}}Ontology",
    f"{{{_OWL}}}AnnotationProperty",
    f"{{{_OWL}}}ObjectProperty",
    f"{{{_OWL}}}DatatypeProperty",
    f"{{{_RDFS}}}Datatype",
}


def _local(uri: str) -> str:
    for sep in ("#", "/"):
        if sep in uri:
            uri = uri.rsplit(sep, 1)[1]
    return uri


def _pred_of(feature_uri: str) -> str:
    """Feature-class local name → canonical predicate string:
    ExpectedFutureReputationChange → expectedFutureReputationChange (the
    SENTIMENT_FEATURE_TYPE casing, insertAllConstantTypes.sql)."""
    name = _local(feature_uri)
    return name[:1].lower() + name[1:] if name else name


class _Graph:
    """Flat resource view merged across every element mentioning a URI
    (RDF/XML lets one resource be described in several places — FIRST's
    punned FinancialInstrument is declared inside another class's
    subClassOf)."""

    def __init__(self) -> None:
        self.labels: dict[str, list[str]] = {}
        self.types: dict[str, list[str]] = {}
        self.parents: dict[str, list[str]] = {}
        self.order: list[str] = []  # first-mention document order
        self.correlations: list[dict] = []
        # canonical display names (kgx:canonicalName literals); absent in
        # third-party ontologies, where labels[0] is the fallback
        self.names: dict[str, str] = {}

    def touch(self, uri: str) -> None:
        if uri not in self.labels:
            self.labels[uri] = []
            self.types[uri] = []
            self.parents[uri] = []
            self.order.append(uri)

    def ancestry(self, uri: str) -> set[str]:
        """All class URIs reachable via rdf:type ∪ rdfs:subClassOf."""
        seen: set[str] = set()
        stack = list(self.types.get(uri, [])) + list(self.parents.get(uri, []))
        while stack:
            u = stack.pop()
            if u in seen:
                continue
            seen.add(u)
            stack.extend(self.parents.get(u, []))
            stack.extend(self.types.get(u, []))  # punning: class w/ a type
        return seen


def _walk(elem: ET.Element, graph: _Graph) -> None:
    uri = elem.attrib.get(_ABOUT)
    if uri is not None:
        graph.touch(uri)
        tag = elem.tag
        if tag not in _VOCAB_TAGS and "}" in tag:
            # typed-node syntax: the tag is the rdf:type
            graph.types[uri].append(tag.replace("{", "").replace("}", ""))
        props: dict[str, list] = {}
        for child in elem:
            ctag = child.tag
            if ctag == _LABEL:
                if child.text and child.text.strip():
                    graph.labels[uri].append(child.text.strip())
            elif ctag == _TYPE:
                ref = child.attrib.get(_RESOURCE)
                if ref:
                    graph.types[uri].append(ref)
            elif ctag == _SUBCLASS:
                ref = child.attrib.get(_RESOURCE)
                if ref is None:
                    nested = next(iter(child), None)
                    ref = nested.attrib.get(_ABOUT) if nested is not None else None
                if ref:
                    graph.parents[uri].append(ref)
            else:
                local = _local(ctag.replace("{", "").replace("}", ""))
                ref = child.attrib.get(_RESOURCE)
                if local == "canonicalName" and child.text and child.text.strip():
                    graph.names.setdefault(uri, child.text.strip())
                props.setdefault(local, []).append(
                    ref if ref is not None else (child.text or "").strip()
                )
        if any(l.startswith("correlationDefinition") or l.startswith("correlationPolarity") for l in props):
            props["_about"] = [uri]
            graph.correlations.append(props)
    for child in elem:
        _walk(child, graph)


def load_owl(
    path: str,
    sentiment_root: str = "SentimentObject",
    positive_root: str = "OrientationPhrasePositive",
    negative_root: str = "OrientationPhraseNegative",
    indicator_prefix: str = "Indicator",
    feature_root: str = "ObjectFeature",
    alias_type: str = "AliasDefinition",
) -> resources.KnowledgeBase:
    """Parse an OWL/RDF-XML ontology file into a KnowledgeBase.

    Root names are matched on local name (suffix-insensitive for the
    orientation roots, so FIRST's ``General_Inquirer_OrientationPhrase
    Positive`` and a plain ``OrientationPhrasePositive`` both bind).
    Indicators without a correlation definition are skipped — the
    dimension row requires the (correlation, object_class, feature)
    triple, and the reference's matching JAPE rules fire only on
    correlated indicators (FIRSTOntology.owl CorrelationDefinition
    usage)."""
    graph = _Graph()
    _walk(ET.parse(path).getroot(), graph)

    def roots_matching(pred) -> set[str]:
        return {u for u in graph.order if pred(_local(u))}

    sent_roots = roots_matching(lambda n: n == sentiment_root)
    pos_roots = roots_matching(lambda n: n.endswith(positive_root))
    neg_roots = roots_matching(lambda n: n.endswith(negative_root))
    feat_roots = roots_matching(lambda n: n == feature_root)

    gaz: list[tuple[str, str, str, str]] = []
    lex: list[tuple[str, str]] = []
    inds: list[tuple[str, str, str, str, int, str, str]] = []
    aliases: list[tuple[str, str]] = []
    feat_surfaces: list[tuple[str, str]] = []

    # correlation lookup: indicator uri → (polarity, object_class, pred)
    corr_of: dict[str, tuple[int, str, str]] = {}
    for c in graph.correlations:
        pol = 0
        for v in c.get("correlationPolarityPositive", []):
            pol = 1 if str(v).strip().lower() == "true" else -1
        for v in c.get("correlationPolarityNegative", []):
            if str(v).strip().lower() == "true":
                pol = -1
        obj = c.get("correlationDefinitionInlfuencesObject", []) or c.get(
            "correlationDefinitionInfluencesObject", []
        )  # FIRST ships the misspelled property name; accept both
        feat = c.get("correlationDefinitionInfluencesFeature", [])
        if not (pol and obj and feat):
            continue
        for ind_uri in c.get("correlationDefinitionIsInfluencedByIndicator", []):
            corr_of.setdefault(ind_uri, (pol, _local(obj[0]), _pred_of(feat[0])))

    for uri in graph.order:
        labels = graph.labels[uri]
        anc = graph.ancestry(uri)
        anc_locals = {_local(a) for a in anc}
        local = _local(uri)

        # orientation lexicon (terms are matched case-folded downstream)
        if anc & pos_roots or any(_local(a).endswith(positive_root) for a in anc):
            for t in labels:
                lex.append((t.lower(), "positive"))
            continue
        if anc & neg_roots or any(_local(a).endswith(negative_root) for a in anc):
            for t in labels:
                lex.append((t.lower(), "negative"))
            continue

        # feature aliases: AliasDefinition-typed nodes, case preserved
        if alias_type in {_local(t) for t in graph.types.get(uri, [])}:
            # the node's own local name names the canonical predicate
            canonical = _pred_of(uri)
            canonical = canonical[: -len("Aliases")] if canonical.endswith("Aliases") else canonical
            for a in labels:
                aliases.append((a, canonical))
            continue

        # object features: labels are text surfaces for the predicate
        if anc & feat_roots:
            pred = _pred_of(uri)
            for s in labels:
                feat_surfaces.append((s.lower(), pred))
            continue

        # indicators: typed under Indicator* classes, joined to correlations
        ind_types = [
            _local(t)
            for t in graph.types.get(uri, [])
            if _local(t).startswith(indicator_prefix)
            and _local(t) != indicator_prefix
        ] or sorted(
            a for a in anc_locals if a.startswith(indicator_prefix) and a != indicator_prefix
        )
        if ind_types and uri in corr_of:
            pol, obj_cls, pred = corr_of[uri]
            ind_type = ind_types[0][len(indicator_prefix):] or "Indicator"
            name = graph.names.get(uri) or (labels[0] if labels else local)
            for s in labels or [name]:
                inds.append((uri, name, s, ind_type, pol, obj_cls, pred))
            continue

        # gazetteer: labeled resources under the SentimentObject root
        if labels and anc & sent_roots and uri not in sent_roots:
            # entity type: immediate rdf:type (individuals) else immediate
            # parent (labeled subclasses), local name — subtype preserved
            imm = [
                t for t in graph.types.get(uri, [])
                if _local(t) not in ("Class", "NamedIndividual")
            ]
            etype_uri = imm[0] if imm else (graph.parents.get(uri) or [""])[0]
            etype = _local(etype_uri)
            name = graph.names.get(uri, labels[0])
            for s in labels:
                gaz.append((uri, name, etype, s))

    return resources.KnowledgeBase(
        gazetteer=gaz,
        lexicon=lex,
        indicators=inds,
        feature_alias=aliases,
        feature_surfaces=feat_surfaces,
    )


# ---------------------------------------------------------------------------
# inverse rendering: KnowledgeBase → RDF/XML
# ---------------------------------------------------------------------------

_KGX_NS = "http://kgx.example.org/onto#"


def save_owl(kb: resources.KnowledgeBase, path: str) -> str:
    """Write a KnowledgeBase as one self-contained OWL/RDF-XML file that
    load_owl parses back to the identical dimensions (round-trip pinned by
    pytest over the full default KB). Returns kb.version()."""
    w: list[str] = []
    w.append('<?xml version="1.0"?>')
    w.append(
        "<rdf:RDF"
        f'\n    xmlns:rdf="{_RDF}"'
        f'\n    xmlns:rdfs="{_RDFS}"'
        f'\n    xmlns:owl="{_OWL}"'
        f'\n    xmlns:kgx="{_KGX_NS}">'
    )

    def res(uri: str) -> str:
        return quoteattr(uri)

    def cls(uri: str, parent: str | None = None, labels: list[str] = ()) -> None:
        w.append(f"  <owl:Class rdf:about={res(uri)}>")
        if parent:
            w.append(f"    <rdfs:subClassOf rdf:resource={res(parent)}/>")
        for l in labels:
            w.append(f"    <rdfs:label>{escape(l)}</rdfs:label>")
        w.append("  </owl:Class>")

    def indiv(
        uri: str, type_uri: str, labels: list[str], name: str | None = None
    ) -> None:
        w.append(f"  <owl:NamedIndividual rdf:about={res(uri)}>")
        w.append(f"    <rdf:type rdf:resource={res(type_uri)}/>")
        if name is not None:
            # the canonical name is NOT always a surface form (labels carry
            # the match surfaces); ship it explicitly so load_owl does not
            # have to guess it as labels[0]
            w.append(f"    <kgx:canonicalName>{escape(name)}</kgx:canonicalName>")
        for l in labels:
            w.append(f"    <rdfs:label>{escape(l)}</rdfs:label>")
        w.append("  </owl:NamedIndividual>")

    sent_root = _KGX_NS + "SentimentObject"
    cls(sent_root)

    # gazetteer: type classes under SentimentObject, one individual per uri
    seen_types: set[str] = set()
    by_uri: dict[str, tuple[str, str, list[str]]] = {}
    for uri, name, etype, surface in kb.gazetteer:
        t_uri = _KGX_NS + etype
        if etype not in seen_types:
            seen_types.add(etype)
            cls(t_uri, sent_root)
        ent = by_uri.setdefault(uri, (t_uri, name, []))
        if surface not in ent[2]:
            ent[2].append(surface)
    for uri, (t_uri, name, surfaces) in by_uri.items():
        indiv(uri, t_uri, surfaces, name=name)

    # orientation lexicon
    pos_root = _KGX_NS + "OrientationPhrasePositive"
    neg_root = _KGX_NS + "OrientationPhraseNegative"
    cls(pos_root)
    cls(neg_root)
    for i, (term, polarity) in enumerate(kb.lexicon):
        root = pos_root if polarity == "positive" else neg_root
        indiv(f"{_KGX_NS}term_{i}_{_local(root)}", root, [term])

    # object features (surfaces as labels) — class name encodes the pred
    feat_root = _KGX_NS + "ObjectFeature"
    cls(feat_root)
    by_pred: dict[str, list[str]] = {}
    for surface, pred in kb.feature_surfaces:
        by_pred.setdefault(pred, []).append(surface)
    for pred, surfaces in by_pred.items():
        cls(_KGX_NS + pred[:1].upper() + pred[1:], feat_root, surfaces)

    # feature aliases: AliasDefinition typed nodes, labels keep case
    by_canon: dict[str, list[str]] = {}
    for alias, canonical in kb.feature_alias:
        by_canon.setdefault(canonical, []).append(alias)
    for canonical, al in by_canon.items():
        uri = _KGX_NS + canonical[:1].upper() + canonical[1:] + "Aliases"
        w.append(f"  <kgx:AliasDefinition rdf:about={res(uri)}>")
        for a in al:
            w.append(f"    <rdfs:label>{escape(a)}</rdfs:label>")
        w.append("  </kgx:AliasDefinition>")

    # indicators + correlation definitions
    ind_seen: dict[str, tuple[str, str, list[str], int, str, str]] = {}
    for uri, name, surface, ind_type, corr, obj_cls, pred in kb.indicators:
        ent = ind_seen.setdefault(uri, (ind_type, name, [], corr, obj_cls, pred))
        if surface not in ent[2]:
            ent[2].append(surface)
    ind_type_classes: set[str] = set()
    for uri, (ind_type, name, surfaces, corr, obj_cls, pred) in ind_seen.items():
        t_uri = _KGX_NS + "Indicator" + ind_type
        if t_uri not in ind_type_classes:
            ind_type_classes.add(t_uri)
            cls(t_uri, _KGX_NS + "Indicator")
        indiv(uri, t_uri, surfaces, name=name)
        cd_uri = _KGX_NS + "CorrDef_" + _local(uri)
        w.append(f"  <kgx:CorrelationDefinition rdf:about={res(cd_uri)}>")
        w.append(
            f"    <kgx:correlationDefinitionIsInfluencedByIndicator rdf:resource={res(uri)}/>"
        )
        w.append(
            f"    <kgx:correlationDefinitionInlfuencesObject rdf:resource={res(_KGX_NS + obj_cls)}/>"
        )
        feat_uri = _KGX_NS + pred[:1].upper() + pred[1:]
        w.append(
            f"    <kgx:correlationDefinitionInfluencesFeature rdf:resource={res(feat_uri)}/>"
        )
        w.append(
            "    <kgx:correlationPolarityPositive>"
            + ("true" if corr > 0 else "false")
            + "</kgx:correlationPolarityPositive>"
        )
        w.append("  </kgx:CorrelationDefinition>")

    w.append("</rdf:RDF>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(w) + "\n")
    return kb.version()
