"""Shared registry helpers: parquet table loader + KB namespace constants.

Split out of kgx/queries.py in round 5 (VERDICT r4 #7) — bodies moved
verbatim; kgx.queries re-exports everything and holds the ordered
REGISTRY.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from kgx import aggregate as agg_mod
from kgx import (
    asof,
    assemble,
    dedup,
    graph,
    linking,
    mentions,
    multimodal,
    relations,
    resources,
    similarity,
    textops,
)


NS = "http://kgx.example.org/onto#"
P_REP = resources.PRED_REPUTATION
P_PRICE = resources.PRED_PRICE
P_VOL = resources.PRED_VOLATILITY
def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
def _session_alive(spark: SparkSession) -> bool:
    try:
        return not spark.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False
