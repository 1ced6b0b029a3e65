"""Model-based Hybrid/FUZZY scorer — the pluggable-scorer variant of A6.

The reference runs per-(sentiment object, object feature) ML classifiers
(pos/neg .gapp models) on each document and maps the winning class to a
degree-of-membership label (NewApproachHybridFuzzy.java:162-271). The
production kgx path renders that as the JVM-side expression ladder
(aggregate.dom_label_expr — SURVEY §2.4 A6's sanctioned simplification).

THIS module is the other sanctioned rendering: a broadcast LINEAR model
applied with pandas/Arrow UDFs — the exact surface a real learned scorer
ships in (weights broadcast once per executor, vectorized batch scoring),
verified equivalent to the ladder by pytest and by a registry oracle row.

Model shape: one-vs-rest linear scores over the feature map
phi(d) = [1, |d|, d^2]. Bin i's weight row is chosen so that

    W_i · phi(d) = -(|d| - mid_i)^2

i.e. argmax over bins = nearest-DoM-midpoint, which on the equal-width
ladder ([0,.2) no … [.8,1] maximum) is exactly the lo <= |d| < hi bin;
boundary ties resolve to the HIGHER bin, matching the ladder's `>= lo`.

Two execution modes, same result:

  * mode="map" (default, the 100 TB path): polarity counts aggregate
    JVM-side first (partial map-side combine, slim (group, pos_n, neg_n)
    rows through the shuffle), then ONE mapInPandas pass scores thousands
    of groups per Arrow batch. No per-group Python state at all.
  * mode="group": applyInPandas per (conv_id, subj, pred) group over the
    raw fact rows — the literal per-document-per-(SO,OF) shape of the
    reference's classifier loop. Same output; costs a full shuffle of the
    fact rows into Python, so it exists for API parity and testing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kgx.resources import CLS_HYBRID_FUZZY, DOM_BOUNDS


def default_dom_model() -> np.ndarray:
    """(n_bins, 3) weight matrix W with W_i·[1, |d|, d²] = -(|d|-mid_i)²."""
    mids = [avg for (_label, _lo, _hi, avg) in DOM_BOUNDS]
    return np.array([[-(m * m), 2.0 * m, -1.0] for m in mids], dtype="float64")


DOM_LABELS = [label for (label, _lo, _hi, _avg) in DOM_BOUNDS]


# Two adjacent bins tie exactly when |d| sits on their shared edge; the
# linear expansion -(m²) + 2m|d| - d² then evaluates the two (equal) true
# scores with DIFFERENT rounding (ulp-level, and BLAS batch kernels round
# differently again), so a strict argmax resolves edge cases arbitrarily.
# Scores within this epsilon are treated as tied and resolve to the HIGHER
# bin — the ladder's closed lower bound (`lo <= |d|`). Interior points are
# separated by >= the bin half-width squared (~0.01), 10 orders above it.
_TIE_EPS = 1e-12


def _predict_labels(dscore: np.ndarray, model: np.ndarray) -> np.ndarray:
    """Vectorized one-vs-rest scoring; near-ties go to the HIGHER bin."""
    a = np.abs(dscore)
    phi = np.stack([np.ones_like(a), a, a * a], axis=1)  # (n, 3)
    scores = phi @ model.T  # (n, n_bins)
    best = scores.max(axis=1, keepdims=True)
    tied = scores >= best - _TIE_EPS  # (n, n_bins) bool
    idx = scores.shape[1] - 1 - np.argmax(tied[:, ::-1], axis=1)
    return np.array(DOM_LABELS, dtype=object)[idx]


_OUT_SCHEMA = (
    "conv_id string, subj_name string, pred string, "
    "dscore double, dom_label string"
)


def model_fuzzy_labels(
    facts: DataFrame,
    model: np.ndarray | None = None,
    mode: str = "map",
) -> DataFrame:
    """Per-(conv_id, subject, pred) document score + model-predicted DoM
    label. Groups whose polarity counts are all zero are excluded on both
    sides (A3/P6 — same rule as aggregate.document_triples).

    `model` is captured by the UDF closure — Spark broadcasts it with the
    serialized function to every executor's Python workers (one copy per
    worker, the broadcast-dim pattern for model weights).
    """
    model = default_dom_model() if model is None else np.asarray(model, dtype="float64")

    slim = facts.select(
        "conv_id",
        F.lower("entity_name").alias("subj_name"),
        "pred",
        F.col("score_i").cast("int").alias("sci"),
    )

    if mode == "group":

        def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
            pos = int((pdf["sci"] > 0).sum())
            neg = int((pdf["sci"] < 0).sum())
            if pos + neg == 0:
                return pd.DataFrame(
                    columns=["conv_id", "subj_name", "pred", "dscore", "dom_label"]
                )
            d = (pos - neg) / (pos + neg)
            label = _predict_labels(np.array([d]), model)[0]
            return pd.DataFrame(
                {
                    "conv_id": [pdf["conv_id"].iloc[0]],
                    "subj_name": [pdf["subj_name"].iloc[0]],
                    "pred": [pdf["pred"].iloc[0]],
                    "dscore": [d],
                    "dom_label": [label],
                }
            )

        return slim.groupBy("conv_id", "subj_name", "pred").applyInPandas(
            score_group, schema=_OUT_SCHEMA
        )

    if mode != "map":
        raise ValueError(f"unknown mode: {mode}")

    grp = (
        slim.groupBy("conv_id", "subj_name", "pred")
        .agg(
            F.sum(F.when(F.col("sci") > 0, 1).otherwise(0)).alias("pos_n"),
            F.sum(F.when(F.col("sci") < 0, 1).otherwise(0)).alias("neg_n"),
        )
        .filter((F.col("pos_n") + F.col("neg_n")) > 0)
        .withColumn(
            "dscore",
            (F.col("pos_n") - F.col("neg_n")).cast("double")
            / (F.col("pos_n") + F.col("neg_n")).cast("double"),
        )
        .select("conv_id", "subj_name", "pred", "dscore")
    )

    def score_batches(batches):
        for pdf in batches:
            out = pdf.copy()
            out["dom_label"] = (
                _predict_labels(pdf["dscore"].to_numpy(dtype="float64"), model)
                if len(pdf)
                else pd.Series(dtype=object)
            )
            yield out

    return grp.mapInPandas(score_batches, schema=_OUT_SCHEMA)


def model_fuzzy_triples(facts: DataFrame, model: np.ndarray | None = None) -> DataFrame:
    """Hybrid/FUZZY triples from the model scorer — the classifier column
    and polarity rule match aggregate.fuzzy_triples so the two A6 variants
    are drop-in interchangeable."""
    lab = model_fuzzy_labels(facts, model=model)
    return lab.select(
        "conv_id",
        "subj_name",
        "pred",
        F.when(F.col("dscore") > 0, F.lit("positive"))
        .otherwise(F.lit("negative"))
        .alias("obj_polarity"),
        F.col("dscore").alias("score"),
        F.lit(CLS_HYBRID_FUZZY).alias("classifier"),
        "dom_label",
    )
