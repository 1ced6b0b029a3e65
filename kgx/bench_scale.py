"""Scaling-efficiency probe (north rule): run the identical KG job on the
identical input at a given parallelism and print one JSON line with wall
time + throughput. bench.py launches this twice (local[8], local[32]) in
separate processes — the sandbox stand-in for N vs 4N executors — and
computes efficiency = tput(32) / (4 * tput(8)).

Usage: python -m kgx.bench_scale --cpus 8 --input /tmp/bench_transcripts.parquet
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, required=True)
    p.add_argument("--input", required=True)
    args = p.parse_args()

    from kgx import aggregate, assemble, mentions, relations, resources, session

    spark = session.get_spark(
        f"kgx-scale-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    kb = resources.default_kb()
    transcripts = spark.read.parquet(args.input)
    n_turns = transcripts.count()

    t0 = time.monotonic()
    turns = assemble.assemble_turns(transcripts, num_partitions=max(args.cpus * 2, 16))
    wm = mentions.detect_mentions(turns, kb)
    facts, tf = relations.sentence_facts(wm, kb)
    triples = aggregate.all_triples(facts, tf)
    n_triples = triples.count()
    wall = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "turns": n_turns,
                "triples": n_triples,
                "wall_sec": round(wall, 3),
                "turns_per_sec": round(n_turns / wall, 1),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
