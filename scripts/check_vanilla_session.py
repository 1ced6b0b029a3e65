"""Driver-replica correctness check on a VANILLA SparkSession.

The external driver runs queries() on its OWN session with Spark-default
confs — none of kgx/session.py's settings (dynamic partition overwrite,
UTC timezone, AQE/Arrow toggles, shuffle partitions). Round 2's one red
row (stream_kg_triples) was exactly a dependence on a session conf the
driver doesn't set. This script replays any subset of the registry under
that condition: a bare SparkSession.builder with defaults, compared
row-for-row against the DuckDB oracle.

Usage: python scripts/check_vanilla_session.py [sf_dir] [query ...]
(defaults: sf0.01, the round's new/changed rows + streaming sinks)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

# rows most at risk of session-conf dependence: streaming sinks (write-path
# confs), plus everything new or changed in the current round
DEFAULT_QUERIES = [
    "stream_kg_triples",
    "stream_dedup_docs",
    "stream_conversation_docs",
    "stream_windowed_counts",
    "stream_join_attribution",
    "stream_join_outer",
    # new or changed in round 4
    "mm_image_real_dims",
    "mm_audio_real_meta",
    "mm_video_real_meta",
    "kg_node_properties",
    "kg_query_params",
    "graph_triangles",
    "agg_salted_rollup",
    # changed late in round 4: shared plain_doc_rollup + phrase-edge cache
    "kg_sentence_triples",
    "kg_document_triples",
    "kg_phrase_fact_edges",
    "dedup_exact",  # r4: non-empty oracle via perturbed-copy union
    # round-4c additions
    "dedup_semantic",
    "text_dup_substring",
    "text_bm25",
    "text_ngram_lm",
    "kg_triple_type_check",
    "curate_chunk_documents",
    "events_scd2",
    "kg_multiturn_triples",
    "kg_multiturn_query_params",
    "stream_events_scd2",
    "curate_group_cap",
    "text_lm_score",
    "events_rolling",
    "curate_temperature_sample",
    "text_bpe_pairs",
    "events_outliers",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    names = names or DEFAULT_QUERIES

    spark = (
        SparkSession.builder.appName("kgx-vanilla-check")
        .master(os.environ.get("SPARK_GRAFT_MASTER", "local[8]"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from scripts.check_contract import TABLES, canon_rows

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    fails = 0
    for name in names:
        try:
            got = qs[name](spark, sf_dir).toPandas()
            want = con.execute(oracles[name]).fetchdf()
            assert sorted(got.columns) == sorted(want.columns), "column mismatch"
            g, w = canon_rows(got), canon_rows(want)
            assert len(g) == len(w), f"rowcount {len(g)} vs {len(w)}"
            assert g == w, "value mismatch"
            print(f"ok   {name}: rows={len(g)} values match (vanilla session)")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            fails += 1
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
