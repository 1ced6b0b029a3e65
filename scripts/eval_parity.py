"""Triple-extraction parity evaluation (north rule: P/R >= 0.95).

Runs the REAL Spark pipeline and the independent pure-Python differential
oracle (tests/oracle.py) on a deterministic synthetic corpus and reports
precision/recall on semantic triple identity. Writes BENCH/PARITY.md.

Usage: python scripts/eval_parity.py [n_convs] [turns_per_conv] [seed ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyspark.sql.functions as F  # noqa: E402

from kgx import aggregate, assemble, relations, resources, session, synth  # noqa: E402
from tests.oracle import Oracle  # noqa: E402
from tests.test_pipeline_golden import _canon  # noqa: E402


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    turns_per_conv = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    seeds = [int(s) for s in sys.argv[3:]] or [7, 23, 101]

    spark = session.get_spark("kgx-parity", master="local[8]", shuffle_partitions=8)
    kb = resources.default_kb()
    rows = []
    for seed in seeds:
        pdf = synth.make_transcripts(
            n_convs=n_convs, turns_per_conv=turns_per_conv, seed=seed
        )
        turns = assemble.admit_turns(spark.createDataFrame(pdf))
        facts, tf = relations.extract_facts(turns, kb)
        got = (
            aggregate.all_triples(facts, tf)
            .withColumn("score", F.col("score").cast("string"))
            .toPandas()
        )
        want = Oracle(kb).run(pdf)
        got_set, want_set = _canon(got), _canon(want)
        missing, extra = want_set - got_set, got_set - want_set
        p = 1 - len(extra) / max(len(got_set), 1)
        r = 1 - len(missing) / max(len(want_set), 1)
        rows.append(
            {
                "seed": seed,
                "turns": len(pdf),
                "oracle_triples": len(want_set),
                "spark_triples": len(got_set),
                "precision": round(p, 6),
                "recall": round(r, 6),
            }
        )
        print(json.dumps(rows[-1]))
    spark.stop()

    md = [
        "# PARITY — triple-extraction precision/recall vs differential oracle",
        "",
        "Spark pipeline (admit → Arrow-UDF mentions → relations → linking →",
        "aggregation, the `kgx.job` hot path) vs the independent pure-Python",
        "oracle (`tests/oracle.py` — its own matcher and arithmetic) on",
        "deterministic synthetic corpora; comparison on semantic triple",
        "identity (conv, turn, level, subj name/uri/type, pred, polarity,",
        "score, classifier, dom, indicator). North-rule target: P/R >= 0.95.",
        "",
        "| seed | turns | oracle triples | spark triples | precision | recall |",
        "|---|---|---|---|---|---|",
    ]
    for x in rows:
        md.append(
            f"| {x['seed']} | {x['turns']} | {x['oracle_triples']} | "
            f"{x['spark_triples']} | {x['precision']} | {x['recall']} |"
        )
    md.append("")
    with open(os.path.join(REPO, "BENCH", "PARITY.md"), "w") as f:
        f.write("\n".join(md))


if __name__ == "__main__":
    main()
