"""One-shot refactoring tool (round 5, VERDICT r4 #7): split the 5.2k-line
kgx/queries.py into per-family row modules under kgx/rows/, leaving
kgx/queries.py as the front door that re-exports every name and holds the
ordered REGISTRY (the driver-window order policy stays in ONE reviewable
place). Verbatim source movement — bodies are line-sliced from the
original, never re-rendered, so behavior cannot drift.
"""

from __future__ import annotations

import ast
import builtins
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "kgx", "queries.py")

MODULES = ["base", "kg", "text", "dedupann", "mm", "events", "curate", "stream"]

MODULE_DOC = {
    "base": "Shared registry helpers: parquet table loader + KB namespace constants.",
    "kg": "KG-pipeline rows (SURVEY §2 S/P/J/A/W ops): extraction trio, window/\nordering, aggregations, linking, dims, node/edge materialization,\nconnected components, multi-turn twins — plus their DuckDB oracle SQL.",
    "text": "Text-analysis rows: token counts, quality, lang-id, vocab, fingerprint,\nrepetition, TF-IDF, BM25, n-gram LM, BPE pair stats, duplicated-substring\ncoverage — plus their DuckDB oracle SQL.",
    "dedupann": "Deduplication + similarity-search + sketch rows: exact/ngram/minhash/\nsimhash/embedding/semantic dedup, ANN (dot/cosine/IVF/LSH/PQ), HLL/CMS/\nBloom sketches — plus their DuckDB oracle SQL.",
    "mm": "Multimodal rows: opaque-binary media plumbing, real header kernels\n(PNG/GIF/JPEG/WAV/MP4), and the header-only MP4 frame index — plus their\nDuckDB oracle SQL.",
    "events": "Relational/analytics rows over events + TPC-H tables: pivots, set ops,\nas-of/range joins, stats profiles, graph analytics, funnel/rolling/SCD2/\noutliers — plus their DuckDB oracle SQL.",
    "curate": "Training-data curation rows: decontamination, packing, PII redaction,\nstratified/temperature sampling, keep-lists, chunking, group caps — plus\ntheir DuckDB oracle SQL.",
    "stream": "Structured-Streaming rows: the KG stream, conversation docs, windowed\ncounts, stream joins, dedup, SCD2 and entity-carryover streams (batch-\noracle-sharing twins).",
}


def classify(name: str) -> str:
    table = {
        "NS": "base", "P_REP": "base", "P_PRICE": "base", "P_VOL": "base",
        "_t": "base", "_session_alive": "base",
        "sessionize": "kg", "SESSIONIZE_SQL": "kg",
        "agg_salted_rollup": "kg", "AGG_SALTED_SQL": "kg",
        "cc_canonicalize": "kg", "CC_SQL": "kg",
        "_SQL_FOLD_DOT": "dedupann", "_SQL_FOLD_SQDIST": "dedupann",
        "_BM25_TERMS": "text",
        "_FUNNEL_STEPS": "events", "_EVENT_TYPES": "events",
        "_PR_ITER": "events",
    }
    if name in table:
        return table[name]
    rules = [
        (r"^(kg_|KG_|_kg|_KG|_doc_transcripts|_doc_mt_transcripts|w[123]_|W[123]_|a[12346-7]_|A[12346-7]_|j[17]_|J[17]_|p1_|P1_)", "kg"),
        (r"^(text_|TEXT_|TOKEN_COUNT_SQL|FINGERPRINT_SQL)", "text"),
        (r"^(dedup_|DEDUP_|ann_|ANN_|_ANN_|_ann_|_minhash|_simhash|_neardup|_NEARDUP|_NGRAM_MAX_DF|_hyperplane|_ivf|_pq_|_PQ_|sketch_|SKETCH_|_HLL_P|_hll_|_CMS_|_BLOOM_|_semdedup)", "dedupann"),
        (r"^(mm_|MM_|_MM_|_doc_media|_synth_media)", "mm"),
        (r"^(tpch_|TPCH_|events_|EVENTS_|setop_|SETOP_|asof_|ASOF_|range_join|RANGE_JOIN|stats_|STATS_|graph_|GRAPH_|_GRAPH_|_cust_supp)", "events"),
        (r"^(curate_|CURATE_|_CONTAM_|_PACK_|_SAMPLE_)", "curate"),
        (r"^(stream_|STREAM_|_stream_)", "stream"),
    ]
    for pat, mod in rules:
        if re.match(pat, name):
            return mod
    raise SystemExit(f"unclassified top-level name: {name}")


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # import header = everything from `from __future__` through the last
    # top-level import statement before the first non-import def/assign
    imports_end = 0
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            imports_end = node.end_lineno
    header = "".join(lines[21:imports_end])  # skip the module docstring

    # walk top-level statements, slicing source verbatim (with any comment
    # block immediately above each statement)
    def seg_start(node):
        i = node.lineno - 1
        # attach contiguous preceding comment lines (section banners)
        j = i
        while j > 0 and (lines[j - 1].lstrip().startswith("#") or lines[j - 1].strip() == ""):
            j -= 1
        # don't swallow pure blank runs — trim leading blanks back
        while j < i and lines[j].strip() == "":
            j += 1
        return j

    pieces: dict[str, list[tuple[int, str, list[str]]]] = {m: [] for m in MODULES}
    registry_src = None
    defined_in: dict[str, str] = {}
    prev_mod = "base"
    prev_end = imports_end  # guard: never re-slice header lines
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)) or (
            isinstance(node, ast.Expr) and node.lineno <= imports_end
        ):
            continue
        if isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant) \
                and node.lineno < 22:
            continue  # module docstring
        names = []
        if isinstance(node, ast.FunctionDef):
            names = [node.name]
        elif isinstance(node, ast.Assign):
            names = []
            for t in node.targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
                elif isinstance(t, ast.Tuple):
                    names.extend(e.id for e in t.elts if isinstance(e, ast.Name))
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = [node.target.id]
        if "REGISTRY" in names:
            registry_src = "".join(lines[seg_start(node) - 0:node.end_lineno])
            # keep the policy comment block attached
            registry_src = "".join(lines[seg_start(node):node.end_lineno])
            prev_end = node.end_lineno
            continue
        if names:
            mod = classify(names[0])
            for n in names:
                defined_in[n] = mod
        else:
            mod = prev_mod  # asserts / bare exprs stick with prior statement
        start = max(seg_start(node), prev_end)
        segment = "".join(lines[start:node.end_lineno])
        pieces[mod].append((node.lineno, segment, names))
        prev_mod = mod
        prev_end = node.end_lineno

    assert registry_src and registry_src.startswith("#"), "registry comment lost"

    os.makedirs(os.path.join(REPO, "kgx", "rows"), exist_ok=True)

    builtin_names = set(dir(builtins))
    header_names = set()
    for node in ast.parse(header).body:
        for alias in node.names:
            header_names.add((alias.asname or alias.name).split(".")[0])
    header_names |= {"F", "agg_mod"}

    module_srcs = {}
    for mod in MODULES:
        body = "".join(seg for _ln, seg, _ns in sorted(pieces[mod]))
        own = {n for _ln, _seg, ns in pieces[mod] for n in ns}
        used = set()
        for n in ast.walk(ast.parse(body)):
            if isinstance(n, ast.Name):
                used.add(n.id)
        needed = {}
        for name in sorted(used - own - builtin_names - header_names):
            src_mod = defined_in.get(name)
            if src_mod and src_mod != mod:
                needed.setdefault(src_mod, []).append(name)
        dep_imports = "".join(
            f"from kgx.rows.{m} import {', '.join(sorted(ns))}  # noqa: E501\n"
            for m, ns in sorted(needed.items())
        )
        doc = MODULE_DOC[mod]
        module_srcs[mod] = (
            f'"""{doc}\n\nSplit out of kgx/queries.py in round 5 (VERDICT r4 #7) — bodies moved\nverbatim; kgx.queries re-exports everything and holds the ordered\nREGISTRY.\n"""\n\n'
            + header + "\n" + dep_imports + "\n" + body
        )

    for mod, text in module_srcs.items():
        with open(os.path.join(REPO, "kgx", "rows", f"{mod}.py"), "w") as f:
            f.write(text)
    with open(os.path.join(REPO, "kgx", "rows", "__init__.py"), "w") as f:
        f.write('"""Per-family registry row modules (split from kgx/queries.py)."""\n')

    # front door: re-export every top-level name, then the REGISTRY block
    doc_end = tree.body[0].end_lineno if isinstance(tree.body[0], ast.Expr) else 0
    front = "".join(lines[:doc_end]) + "\n"
    front += "from __future__ import annotations\n\n"
    for mod in MODULES:
        names = sorted({n for _ln, _seg, ns in pieces[mod] for n in ns})
        if not names:
            continue
        front += f"from kgx.rows.{mod} import (  # noqa: F401\n"
        for n in names:
            front += f"    {n},\n"
        front += ")\n"
    # _KG_CACHE is assigned (not def) in kg and must stay the SAME dict
    front += "\n" + registry_src
    with open(SRC, "w") as f:
        f.write(front)
    print("split complete:", {m: len(pieces[m]) for m in MODULES})


if __name__ == "__main__":
    main()
