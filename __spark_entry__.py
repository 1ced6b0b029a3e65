"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: the full KG-extraction pipeline (Arrow-UDF
                 mention detection → relation assembly → broadcast linking →
                 scored aggregation) over sf0.001 documents rendered as
                 single-turn transcripts; returns the triples DataFrame.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — matching DuckDB SQL for EVERY registered query: float
                 folds use the left-fold double trick, hashing uses
                 md5-derived forms (dedup.md5_hash60, literal centroids /
                 hyperplanes), so even the MinHash / SimHash / IVF /
                 hyperplane-LSH pipelines are value-hash-checked
                 cross-engine.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kgx import aggregate, queries as q

    facts, tf = q._kg_run(spark, "/root/testdata/sf0.001")
    return aggregate.all_triples(facts, tf)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgx.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from kgx.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
