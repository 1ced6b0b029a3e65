"""Regenerate the physical-plan audit numbers for BENCH/PLANS.md.

Runs each audited query at sf0.001 (local[4], AQE on), captures the
AQE-finalized formatted plan after one execution, and prints per-query
operator counts + pushed filters / read schemas.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "kg_sentence_triples",
    "cc_canonicalize",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding",
    "ann_ivf_topk",
    "kg_phrase_fact_edges",
    "tpch_q3_revenue",
    "curate_contamination",
    "curate_pack_sequences",
    "sketch_hll_users",
    "dedup_canonical_docs",
    "a6_model_fuzzy",
    "stats_hist_profile",
    "ann_lsh_topk",
    "mm_image_real_dims",
    "kg_node_properties",
]


def summarize(plan: str) -> dict:
    # formatted mode prints every operator TWICE (tree line + numbered
    # detail section) and tags codegen as "codegen id : N", not
    # "WholeStageCodegen (N)" — count from the detail headers and the
    # codegen-id tags so each physical node counts once (round-4 fix;
    # earlier audits double-counted joins and reported 0 codegen spans)
    ops = re.findall(r"^\((\d+)\) ([A-Za-z]+)", plan, re.M)
    def n(op: str) -> int:
        return sum(1 for _id, o in ops if o == op)
    return {
        "BroadcastHashJoin": n("BroadcastHashJoin"),
        "SortMergeJoin": n("SortMergeJoin"),
        "Exchange": n("Exchange") + n("ShuffleQueryStage"),
        "WholeStageCodegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "ArrowEvalPython": n("ArrowEvalPython"),
        "PushedFilters": sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]", plan))),
        "ReadSchema": sorted(set(re.findall(r"ReadSchema: [^\n]*", plan))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or AUDIT

    from kgx import session
    from kgx.queries import REGISTRY

    spark = session.get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    for name in only:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        df.count()  # execute so AQE finalizes the plan
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        s = summarize(buf.getvalue())
        print(f"### {name}")
        print(
            f"- BroadcastHashJoin: {s['BroadcastHashJoin']}, "
            f"SortMergeJoin: {s['SortMergeJoin']}, Exchange: {s['Exchange']}, "
            f"whole-stage-codegen spans: {s['WholeStageCodegen']}, "
            f"ArrowEvalPython: {s['ArrowEvalPython']}"
        )
        for pf in s["PushedFilters"][:4]:
            print(f"- `{pf}`")
        for rs in s["ReadSchema"][:4]:
            print(f"- `{rs}`")
        print()
    spark.stop()


if __name__ == "__main__":
    main()
