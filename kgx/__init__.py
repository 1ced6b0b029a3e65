"""kgx — a PySpark-native knowledge-graph construction pipeline.

Re-expresses the extraction capabilities of the reference per-document NLP
service (EU-FIRST/semanticinformationextraction, a ZeroMQ/GATE/Hibernate Java
service) as pure DataFrame stages over partitioned transcript tables:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      -> assemble   : window-ordered per-conversation turn assembly (W1)
      -> mentions   : Arrow pandas-UDF gazetteer/lexicon/indicator detection (S9, P3)
      -> relations  : per-turn (subj, pred, polarity) relation extraction (A4, J5)
      -> linking    : broadcast-join entity linking + alias normalization (J1-J4)
      -> canonical  : connected-components canonicalization (first-wins, W2)
      -> aggregate  : sentence + document level scoring (A1-A3, A6/J7)
      -> materialize: partitioned triple/node/edge/mention tables + lineage (S6/S7/S10)

Design rules (see SURVEY.md):
  * DataFrame/SQL only — no RDDs, no per-row Python UDFs; Python code runs in
    Arrow-batched pandas UDFs exclusively.
  * Small dimensions (gazetteer, lexicon, indicators, alias maps, DoM bounds)
    are broadcast; the only shuffles are the per-conversation repartition and
    the grouped aggregations, both keyed on conv_id / entity_id with salting
    available for hot keys.
  * Deterministic content-hash entity ids replace the reference's
    order-dependent Hibernate get-or-create identity columns
    (DatabaseFacade.java:987-1018) so output is retry/parallelism independent.
"""

__version__ = "0.1.0"
