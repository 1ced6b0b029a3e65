"""Stage 6 — scoring + aggregation (A1-A4, A6/J7) and routing (P1).

Reference semantics reproduced exactly (shared with tests/oracle.py):

  A4  sentence score: polarity → {-1, 0, +1}
      (SentimentClassification.java:641-653).
  A2  one document-level group per distinct (object name, feature name),
      case-insensitive, first-seen casing preserved
      (ClassifiedDocument.java:99-123; W2 first-wins).
  A3  document score = (#pos − #neg) / (#pos + #neg) over the group's
      sentences; zero-polarity sentences count in NEITHER numerator NOR
      denominator (NewArticleAssessmentClassificator.java:72-82); polarity =
      score > 0 ? positive : negative (SentimentClassification.java:622-626).
  A1  PosNegWordRatio fallback for conversations with no entity mention
      (routing P1, CompletePipelineWorker.java:194-219): score =
      (pos − neg)/(pos + neg) over orientation-term counts; NaN guard drops
      the row when pos + neg == 0 (WorkerThread.java:146-147).
  A6  fuzzy degree-of-membership binning of |doc score| into the 5 DoM bins
      (NewApproachHybridFuzzy.java:183-271 via FuzzyLabels; bounds from
      insertAllConstantTypes.sql) — expression ladder, no per-group rescan.

Decimal contract: scores are DECIMAL(18,16) rounded HALF_EVEN
(WorkerThread.java:160-162). Spark's decimal cast rounds HALF_UP, so we
bround(x, 16) (HALF_EVEN) *before* the cast.

Scale notes: all aggregations key on conv_id (+ lowercased group cols) — the
input is already hash-partitioned by conv_id, so groupBy(conv_id, ...)
reuses the exchange. For hot entities at 10^12 turns use
`salted_doc_rollup` (two-phase agg over pmod(xxhash64(conv_id), K)).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kgx import schema
from kgx.resources import (
    CLS_HYBRID_FUZZY,
    CLS_KNOWLEDGE_BASED,
    CLS_POSNEG_RATIO,
    DOM_BOUNDS,
    PRED_REPUTATION,
)

_SCORE = schema.SCORE_TYPE


def _decimal_score(col):
    """double → DECIMAL(18,16) with HALF_EVEN rounding (bround), matching
    BigDecimal.setScale(16, ROUND_HALF_EVEN)."""
    return F.bround(col, 16).cast(_SCORE)


def _polarity_from_int(score_col):
    return (
        F.when(score_col > 0, F.lit("positive"))
        .when(score_col < 0, F.lit("negative"))
        .otherwise(F.lit("neutral"))
    )


def sentence_triples(facts: DataFrame) -> DataFrame:
    """A4: sentence-level triples from stage-3 facts."""
    return facts.select(
        "conv_id",
        "turn_idx",
        F.lit("sentence").alias("level"),
        F.col("entity_id").alias("subj_id"),
        F.col("entity_uri").alias("subj_uri"),
        F.col("entity_name").alias("subj_name"),
        F.col("entity_type").alias("subj_type"),
        "pred",
        "subfeature",
        _polarity_from_int(F.col("score_i")).alias("obj_polarity"),
        _decimal_score(F.col("score_i").cast("double")).alias("score"),
        F.lit(CLS_KNOWLEDGE_BASED).alias("classifier"),
        F.lit(None).cast("string").alias("dom_label"),
        "indicator_uri",
        "ts_day",
    )


def plain_doc_rollup(facts: DataFrame) -> DataFrame:
    """Unsalted one-phase rollup per (conv, entity-name lower, pred) —
    the direct branch of document_triples, shared with the skew probe
    (kgx/bench_skew.py) so the probe always measures the production plan."""
    return facts.groupBy(
        "conv_id",
        F.lower("entity_name").alias("name_lc"),
        "pred",
    ).agg(
        F.sum(F.when(F.col("score_i") > 0, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("score_i") < 0, 1).otherwise(0)).alias("neg"),
        # first-seen (lowest turn) original casing + identity — W2.
        # The ordering struct must be UNIQUE per distinct subj within
        # the group or min_by picks an arbitrary winner under ties
        # (two same-name entities in one turn): name breaks the turn
        # tie, uri breaks a same-name tie (matching the oracle's
        # min(uri)), entity_id is the total-order backstop.
        F.min_by(
            F.struct("entity_id", "entity_uri", "entity_name", "entity_type"),
            F.struct("turn_idx", "entity_name", "entity_uri", "entity_id"),
        ).alias("subj"),
        F.min("ts_day").alias("ts_day"),
    )


def document_triples(
    facts: DataFrame, with_fuzzy: bool = True, salt_buckets: int | None = None
) -> DataFrame:
    """A2 + A3 (+ A6 fuzzy rows): document-level triples per
    (conv, entity-name lower, pred). salt_buckets switches the rollup to
    the two-phase salted aggregation (same totals; bounds the largest
    reduce-side group under hot-entity skew — see salted_doc_rollup)."""
    if salt_buckets:
        rolled = salted_doc_rollup(facts, salt_buckets)
    else:
        rolled = plain_doc_rollup(facts)
    grouped = (
        rolled.filter((F.col("pos") + F.col("neg")) > 0)  # NaN guard (P6)
        .withColumn(
            "dscore",
            (F.col("pos") - F.col("neg")).cast("double")
            / (F.col("pos") + F.col("neg")).cast("double"),
        )
    )
    doc = grouped.select(
        "conv_id",
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit("document").alias("level"),
        F.col("subj.entity_id").alias("subj_id"),
        F.col("subj.entity_uri").alias("subj_uri"),
        F.col("subj.entity_name").alias("subj_name"),
        F.col("subj.entity_type").alias("subj_type"),
        "pred",
        F.lit(None).cast("string").alias("subfeature"),
        # polarity = score > 0 ? positive : negative (reference :622-626)
        F.when(F.col("dscore") > 0, F.lit("positive"))
        .otherwise(F.lit("negative"))
        .alias("obj_polarity"),
        _decimal_score(F.col("dscore")).alias("score"),
        F.lit(CLS_KNOWLEDGE_BASED).alias("classifier"),
        F.lit(None).cast("string").alias("dom_label"),
        F.lit(None).cast("string").alias("indicator_uri"),
        "ts_day",
        F.col("dscore"),
    )
    out = doc.drop("dscore")
    if with_fuzzy:
        out = out.unionByName(fuzzy_triples(doc))
    return out


def dom_label_expr(abs_score_col):
    """J7: degree-of-membership bin ladder (lower ≤ s < upper; top closed)."""
    expr = F.lit("n/a")
    for label, lo, hi, _avg in reversed(DOM_BOUNDS):
        cond = (abs_score_col >= F.lit(lo)) & (
            (abs_score_col < F.lit(hi)) | (F.lit(hi) >= 1.0) & (abs_score_col >= 1.0)
        )
        expr = F.when(cond, F.lit(label)).otherwise(expr)
    return expr


def fuzzy_triples(doc_triples_with_dscore: DataFrame) -> DataFrame:
    """A6: Hybrid/FUZZY rows — DoM bin of |document score| per group."""
    d = doc_triples_with_dscore
    return d.select(
        "conv_id",
        "turn_idx",
        "level",
        "subj_id",
        "subj_uri",
        "subj_name",
        "subj_type",
        "pred",
        "subfeature",
        "obj_polarity",
        "score",
        F.lit(CLS_HYBRID_FUZZY).alias("classifier"),
        dom_label_expr(F.abs(F.col("dscore"))).alias("dom_label"),
        "indicator_uri",
        "ts_day",
    )


def fallback_triples(turn_feats: DataFrame) -> DataFrame:
    """P1 routing + A1: conversations with NO entity mention anywhere get a
    single document-level PosNegWordRatio triple; subject = the document
    pseudo-object; NaN guard drops all-zero conversations."""
    conv = (
        turn_feats.groupBy("conv_id")
        .agg(
            F.max("has_so").alias("conv_has_so"),
            F.sum("pos_cnt").alias("pos"),
            F.sum("neg_cnt").alias("neg"),
            F.min("ts_day").alias("ts_day"),
        )
        .filter(~F.col("conv_has_so"))
        .filter((F.col("pos") + F.col("neg")) > 0)
        .withColumn(
            "dscore",
            (F.col("pos") - F.col("neg")).cast("double")
            / (F.col("pos") + F.col("neg")).cast("double"),
        )
    )
    return conv.select(
        "conv_id",
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit("document").alias("level"),
        F.xxhash64(F.lower("conv_id"), F.lit("")).alias("subj_id"),
        F.lit(None).cast("string").alias("subj_uri"),
        F.col("conv_id").alias("subj_name"),
        F.lit("Document").alias("subj_type"),
        F.lit(PRED_REPUTATION).alias("pred"),
        F.lit(None).cast("string").alias("subfeature"),
        _polarity_from_int(F.col("dscore")).alias("obj_polarity"),
        _decimal_score(F.col("dscore")).alias("score"),
        F.lit(CLS_POSNEG_RATIO).alias("classifier"),
        F.lit(None).cast("string").alias("dom_label"),
        F.lit(None).cast("string").alias("indicator_uri"),
        "ts_day",
    )


def all_triples(
    facts: DataFrame,
    turn_feats: DataFrame,
    with_fuzzy: bool = True,
    salt_buckets: int | None = None,
) -> DataFrame:
    """sentence ∪ document ∪ fuzzy ∪ fallback — the two classifier branches
    reunite only at the write (SURVEY.md §2.6)."""
    return (
        sentence_triples(facts)
        .unionByName(
            document_triples(facts, with_fuzzy=with_fuzzy, salt_buckets=salt_buckets)
        )
        .unionByName(fallback_triples(turn_feats))
    )


def salted_doc_rollup(facts: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Two-phase salted aggregation for hot entities (north rule): partial
    pos/neg counts per (group, salt) then final rollup — bounds the largest
    reduce-side group at scale (e.g. 'EUR' mentioned in 1% of 10^12 turns).

    Produces the same (pos, neg) totals as the direct groupBy in
    document_triples; used by job.py when --salt is set.
    """
    salted = facts.withColumn(
        "salt", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets))
    )
    partial = salted.groupBy(
        "conv_id", F.lower("entity_name").alias("name_lc"), "pred", "salt"
    ).agg(
        F.sum(F.when(F.col("score_i") > 0, 1).otherwise(0)).alias("pos"),
        F.sum(F.when(F.col("score_i") < 0, 1).otherwise(0)).alias("neg"),
        # same deterministic ordering as the unsalted rollup (see above)
        F.min_by(
            F.struct("entity_id", "entity_uri", "entity_name", "entity_type"),
            F.struct("turn_idx", "entity_name", "entity_uri", "entity_id"),
        ).alias("subj"),
        F.min(
            F.struct("turn_idx", "entity_name", "entity_uri", "entity_id")
        ).alias("first_key"),
        F.min("ts_day").alias("ts_day"),
    )
    return (
        partial.groupBy("conv_id", "name_lc", "pred")
        .agg(
            F.sum("pos").alias("pos"),
            F.sum("neg").alias("neg"),
            F.min_by("subj", "first_key").alias("subj"),
            F.min("ts_day").alias("ts_day"),
        )
    )


def entity_salience(
    triples: DataFrame,
    doc_col: str = "conv_id",
    entity_col: str = "subj_uri",
) -> DataFrame:
    """Per-document entity salience: each entity's share of the
    document's evidence mentions plus its dense salience rank — the
    label a retrieval / entity-linking trainer wants next to every
    (document, entity) pair ("is this THE entity of the doc or a
    passing reference?"). share = n_mentions / n_doc_mentions is one
    IEEE division of exact integers; rank ties break on the entity id
    so the SQL oracle reproduces the order.

    Shape: one evidence-sized groupBy, then two window passes over the
    per-(doc, entity) table — bounded at distinct entities per doc,
    orders of magnitude smaller than evidence. Both windows share the
    doc-key partitioning, so they run in one exchange."""
    from pyspark.sql import Window

    per = triples.groupBy(doc_col, entity_col).agg(
        F.count("*").cast("long").alias("n_mentions")
    )
    tot = Window.partitionBy(doc_col)
    rk = Window.partitionBy(doc_col).orderBy(
        F.col("n_mentions").desc(), F.col(entity_col).asc()
    )
    return (
        per.withColumn(
            "n_doc_mentions", F.sum("n_mentions").over(tot).cast("long")
        )
        .withColumn(
            "salience",
            F.col("n_mentions").cast("double")
            / F.col("n_doc_mentions").cast("double"),
        )
        .withColumn("rank", F.row_number().over(rk).cast("int"))
    )


def temporal_validity(facts: DataFrame) -> DataFrame:
    """Time-scoped fact intervals over a multi-turn conversation — the
    temporal-KG validity model (Wikidata qualifiers / YAGO2 time-scoping)
    applied to transcript extraction: a (subject, predicate) assertion
    holds from the turn it is first stated until the first LATER turn
    that asserts a different polarity; re-assertions of the same polarity
    extend the open interval (turns that mention the pair not at all
    leave it open — "valid until superseded", not "valid while
    repeated").

    Stages: (1) per-(conv, subject, pred, turn) evidence = exact integer
    sum of sentence scores, state = its sign; (2) run-length encode the
    turn-ordered state sequence with a lag-flip + running-sum window;
    (3) one groupBy per run for [valid_from, last_asserted, n_assertions];
    (4) a lead() window closes each interval at the next run's start —
    valid_to NULL = is_current. TWO exchanges total: the per-turn
    evidence groupBy (map-side combined — it clusters on 4 keys, so the
    3-key windows cannot reuse it) and the run-encoding window's
    (conv_id, name_lc, pred) cluster; the run groupBy and the closing
    lead() window both have that 3-key partitioning as a subset of
    their clustering, so Catalyst re-plans NEITHER (audited:
    BENCH/PLANS.md). Per-key state is bounded by the conversation's own
    turn count — the sessionize / funnel bounded-by-key contract.

    Subject identity is lower(entity_name) (the document_triples A2
    convention); all emitted values are integers / strings — engine-exact
    with no float anywhere.
    """
    from pyspark.sql import Window

    per_turn = facts.groupBy(
        "conv_id",
        F.lower("entity_name").alias("name_lc"),
        "pred",
        "turn_idx",
    ).agg(F.sum("score_i").cast("bigint").alias("evidence"))
    state = (
        F.when(F.col("evidence") > 0, 1)
        .when(F.col("evidence") < 0, -1)
        .otherwise(0)
        .cast("int")
    )
    key = ["conv_id", "name_lc", "pred"]
    w = Window.partitionBy(*key).orderBy("turn_idx")
    st = per_turn.select(*key, "turn_idx", state.alias("state"))
    prev = F.lag("state").over(w)
    flip = F.when(prev.isNull() | (prev != F.col("state")), 1).otherwise(0)
    runs = st.withColumn(
        "run_id",
        F.sum(flip).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = runs.groupBy(*key, "run_id").agg(
        F.min("state").alias("state"),
        F.min("turn_idx").cast("int").alias("valid_from"),
        F.max("turn_idx").cast("int").alias("last_asserted"),
        F.count("*").cast("bigint").alias("n_assertions"),
    )
    wr = Window.partitionBy(*key).orderBy("run_id")
    nxt = F.lead("valid_from").over(wr)
    return iv.select(
        *key,
        "state",
        "valid_from",
        nxt.cast("int").alias("valid_to"),
        "last_asserted",
        "n_assertions",
        nxt.isNull().alias("is_current"),
    )
