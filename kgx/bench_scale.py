"""Scaling-efficiency probe (north rule): run the identical KG job on the
identical input at a given parallelism and print one JSON line with wall
time + throughput.

Two modes:
  * --executors E --exec-cores C: master = local-cluster[E,C,3072] — REAL
    separate executor JVMs (own memory, own Python worker pools,
    inter-process shuffle). bench.py runs E=1 vs E=4: literally N vs 4N
    executors, the north rule's own phrasing.
  * --cpus N (thread mode): master = local[N]; the lighter-weight probe
    for per-core sweeps.

Usage: python -m kgx.bench_scale --executors 4 --exec-cores 2 --input DIR
       python -m kgx.bench_scale --cpus 8 --input DIR
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cpus", type=int, default=0, help="thread mode: local[N]")
    p.add_argument(
        "--executors", type=int, default=0,
        help="executor mode: local-cluster[E, exec-cores, 3072]",
    )
    p.add_argument("--exec-cores", type=int, default=2)
    p.add_argument("--input", required=True)
    p.add_argument(
        "--trials",
        type=int,
        default=1,
        help="timed repetitions inside the one warmed session; the MEDIAN "
        "wall is the headline (min + full distribution reported alongside)",
    )
    args = p.parse_args()

    from kgx import aggregate, assemble, relations, resources, session

    # AQE off for the local probe: its sequential query-stage
    # materialization adds ~1-2s latency per shuffle boundary in local mode,
    # which at sandbox scale dominates wall time and masks real scaling
    # (measured: 48s -> 25s at local[32] on 600k turns). On a real cluster
    # AQE stays ON (skew-join splitting matters at 10^12 turns) and its
    # re-planning cost amortizes over minutes-long stages.
    import os

    extra = {"spark.sql.adaptive.enabled": "false"}
    if args.executors:
        # real executor processes: each owns 3 GB + its Python workers;
        # PYTHONPATH ships the package to the executors' workers (the
        # spark-submit deployment uses --py-files dist/kgx.zip instead)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra["spark.executorEnv.PYTHONPATH"] = repo
        master = f"local-cluster[{args.executors},{args.exec_cores},3072]"
        cpus = args.executors * args.exec_cores
        label = f"{args.executors}x{args.exec_cores}"
    else:
        master = f"local[{args.cpus}]"
        cpus = args.cpus
        label = str(args.cpus)
    spark = session.get_spark(
        f"kgx-scale-{label}",
        master=master,
        shuffle_partitions=max(cpus, 8),
        extra_conf=extra,
    )
    kb = resources.default_kb()
    transcripts = spark.read.parquet(args.input)
    n_turns = transcripts.count()

    def run(df):
        # identical dataflow to job.run_pipeline's hot path: map-only
        # admission, slim late dedup inside extract_facts
        turns = assemble.admit_turns(df)
        facts, tf = relations.extract_facts(turns, kb)
        # facts feeds both the sentence and the document branch of
        # all_triples; persist so the link joins run once, not per branch
        facts = facts.persist()
        n = aggregate.all_triples(facts, tf).count()
        facts.unpersist()
        for cached in getattr(facts, "_kgx_persisted", []):
            cached.unpersist()
        return n

    # Warm-up on a small slice: compiles the whole-stage codegen for the
    # identical plan and spins up the Arrow python workers, so the timed
    # trials measure steady-state throughput (what a 1000-executor cluster
    # amortizes to), not one-time JIT + process startup.
    run(transcripts.limit(20000))

    # Multiple timed trials in the SAME warmed session. The MEDIAN wall is
    # the headline estimator: on a shared host external-load bursts slow
    # trials down at random, and taking per-config minima with UNEQUAL
    # trial counts systematically flatters the config given more draws
    # (round 2 recorded a not-credible 1.165 efficiency exactly that way).
    # The median is robust to a burst in either config without cherry-
    # picking; the min and the full distribution are reported alongside so
    # the spread is visible.
    walls: list[float] = []
    n_triples = 0
    for _ in range(max(args.trials, 1)):
        t0 = time.monotonic()
        n_triples = run(transcripts)
        walls.append(round(time.monotonic() - t0, 3))
    import statistics

    wall = round(statistics.median(walls), 3)

    print(
        json.dumps(
            {
                "master": master,
                "executors": args.executors or None,
                "cpus": cpus,
                "turns": n_turns,
                "triples": n_triples,
                "wall_sec": wall,
                "wall_min_sec": min(walls),
                "trial_walls": walls,
                "turns_per_sec": round(n_turns / wall, 1),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
