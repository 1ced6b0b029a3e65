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
    "sketch_cms_heavy_hitters",
    "sketch_bloom_contamination",
    "text_tfidf_topk",
    "text_unigram_lik",
    "kg_entity_carryover",
    "ann_pq_topk",
    "dedup_semantic",
    "text_dup_substring",
    "text_bm25",
    "text_ngram_lm",
    "kg_triple_type_check",
    "curate_chunk_documents",
    "events_scd2",
    "curate_group_cap",
    "kg_multiturn_triples",
    "text_lm_score",
    "events_rolling",
    "curate_temperature_sample",
    "text_bpe_pairs",
    "events_outliers",
    # round-5 training-data surface
    "kg_mention_contexts",
    "graph_negative_samples",
    "graph_random_walks",
    "text_mlm_mask",
    "graph_skipgram_pairs",
    "kg_sft_pairs",
    # round-5 closing batch: fusion family, containment, interleave
    "kg_fact_fusion",
    "kg_fact_provenance",
    "kg_snapshot_diff",
    "kg_entity_salience",
    "dedup_containment",
    "curate_mix_interleave",
    # round-5 extension session
    "graph_ktruss",
    "graph_closeness",
    "stats_chi2",
    "events_attribution",
    "kg_temporal_validity",
    "text_bpe_encode",
    "events_topk_paths",
    "graph_clustering",
    "kg_facts_asof",
    "stats_ks_drift",
    "graph_assortativity",
]


# a tree line: drawing chars / codegen star, then the operator name (first
# identifier), join/build details, then the node id "(N)" — e.g.
# ":- * BroadcastHashJoin LeftOuter BuildRight (111)" or
# "+- ShuffleQueryStage (5), Statistics(...)"
_TREE_NODE = re.compile(r"^[\s:+*-]*([A-Za-z][A-Za-z0-9]*)[^()\n]*\((\d+)\)", re.M)
_DRAWING = " :+-|*"


def _depth(line: str) -> int:
    for i, ch in enumerate(line):
        if ch not in _DRAWING:
            return i
    return len(line)


def _final_plan_nodes(tree: str) -> tuple[dict, dict]:
    """(node id → op name, node id → is-under-cache) for nodes that
    actually execute.

    Sections nest: every AdaptiveSparkPlan — the top-level one AND each
    cached InMemoryRelation's — prints a '== Final Plan ==' and an
    '== Initial Plan ==' sibling at its own indentation, and a cached
    subtree is re-printed (same node ids) at every scan site, including
    inside OTHER plans' Initial sections. A node executes iff every
    enclosing section on its indentation path is Final; dedupe by id so a
    cached plan computed once counts once."""
    stack: list[tuple[int, bool]] = []  # (marker depth, is_final)
    node_stack: list[tuple[int, str]] = []  # (node depth, op) ancestry
    out: dict[str, str] = {}
    cached: dict[str, bool] = {}
    for line in tree.splitlines():
        if not line.strip():
            continue
        d = _depth(line)
        stripped = line.strip(" :+-|*")
        is_marker = stripped.startswith("== Final Plan ==") or stripped.startswith(
            "== Initial Plan =="
        )
        # section CONTENT prints at the same depth as its marker — a node
        # at depth == marker depth stays inside; a sibling marker at the
        # same depth replaces the section
        while stack and (d < stack[-1][0] or (is_marker and d == stack[-1][0])):
            stack.pop()
        if is_marker:
            stack.append((d, stripped.startswith("== Final Plan ==")))
            continue
        m = _TREE_NODE.match(line)
        if not m:
            continue
        while node_stack and d <= node_stack[-1][0]:
            node_stack.pop()
        under_cache = any(op == "InMemoryRelation" for _, op in node_stack)
        node_stack.append((d, m.group(1)))
        if all(fin for _, fin in stack):
            out.setdefault(m.group(2), m.group(1))
            cached[m.group(2)] = cached.get(m.group(2), False) or under_cache
    return out, cached


def summarize(plan: str) -> dict:
    # An AQE formatted explain prints plan TREES (== Final Plan == and
    # == Initial Plan == sections, one pair per AdaptiveSparkPlan — the
    # top-level plan AND every cached InMemoryRelation it scans) followed
    # by numbered DETAIL sections. Two traps:
    #   * initial-plan nodes describe what AQE replanned away (an SMJ that
    #     executed as BHJ) — count final sections only;
    #   * a cached relation's subtree is re-printed at EVERY
    #     InMemoryTableScan site with the SAME node ids — dedupe by id so
    #     a plan computed once counts once.
    tree_end = plan.find("\n(1) ")
    tree = plan[: tree_end if tree_end >= 0 else len(plan)]
    op_by_id, cached_by_id = _final_plan_nodes(tree)
    final_ids = set(op_by_id)
    _PY_OPS = {"ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"}
    # recompute smell: two+ EXECUTING Python nodes outside any cache whose
    # normalized signature (op + Arguments with expression ids stripped)
    # is identical — the same logical UDF stage re-derived per branch.
    # Distinct sequential stages (different funcs) are fine and not flagged.
    sig_of: dict[str, str] = {}
    for section in re.split(r"^(?=\(\d+\) )", plan, flags=re.M):
        h = re.match(r"\((\d+)\) ([A-Za-z]+)", section)
        if not h or h.group(2) not in _PY_OPS:
            continue
        a = re.search(r"^Arguments: ([^\n]*)", section, re.M)
        if a:
            sig_of[h.group(1)] = h.group(2) + "|" + re.sub(r"#\d+L?", "#", a.group(1))
    dup_sigs: dict[str, int] = {}
    for nid, op in op_by_id.items():
        if op in _PY_OPS and not cached_by_id.get(nid, False) and nid in sig_of:
            dup_sigs[sig_of[nid]] = dup_sigs.get(sig_of[nid], 0) + 1
    recomputed_python = sum(c for c in dup_sigs.values() if c > 1)

    def n(op: str) -> int:
        return sum(1 for o in op_by_id.values() if o == op)

    # codegen spans: detail headers carry "[codegen id : N]"; restrict to
    # final-plan node ids so initial-plan copies don't inflate the count
    codegen = {
        cg
        for nid, cg in re.findall(r"^\((\d+)\) [A-Za-z].*codegen id : (\d+)", plan, re.M)
        if nid in final_ids
    }
    return {
        "BroadcastHashJoin": n("BroadcastHashJoin"),
        "SortMergeJoin": n("SortMergeJoin"),
        # ShuffleQueryStage wraps an Exchange it contains — count the
        # Exchange nodes only (each real shuffle prints exactly one in the
        # final tree)
        "Exchange": n("Exchange"),
        "WholeStageCodegen": len(codegen),
        "ArrowEvalPython": n("ArrowEvalPython"),
        "MapInPandas": n("MapInPandas") + n("FlatMapGroupsInPandas"),
        # same-signature Python stages NOT under an InMemoryRelation — the
        # recompute smell that hid in kg_phrase_fact_edges (9 Arrow nodes
        # for one logical UDF stage before the round-4 cache fix)
        "RecomputedPython": recomputed_python,
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
        # execute THIS frame so ITS AdaptiveSparkPlan finalizes — df.count()
        # builds a separate groupBy().count() query and leaves df's own plan
        # at isFinalPlan=false (0 codegen tags, initial-plan Exchanges)
        df.collect()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        s = summarize(buf.getvalue())
        print(f"### {name}")
        print(
            f"- BroadcastHashJoin: {s['BroadcastHashJoin']}, "
            f"SortMergeJoin: {s['SortMergeJoin']}, Exchange: {s['Exchange']}, "
            f"whole-stage-codegen spans: {s['WholeStageCodegen']}, "
            f"ArrowEvalPython: {s['ArrowEvalPython']}, "
            f"MapInPandas: {s['MapInPandas']}"
        )
        if s["RecomputedPython"]:
            print(
                f"- **WARN: {s['RecomputedPython']} same-signature uncached "
                "Python stages** — a re-derived branch re-executes the same "
                "UDF; the shared upstream should persist"
            )
        for pf in s["PushedFilters"][:4]:
            print(f"- `{pf}`")
        for rs in s["ReadSchema"][:4]:
            print(f"- `{rs}`")
        print()
    spark.stop()


if __name__ == "__main__":
    main()
