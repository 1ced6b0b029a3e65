"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Also (unless BENCH_SKIP_SCALING=1) runs the north-rule scaling probe — the
full KG-extraction job on an identical synthetic transcript corpus at N
and 4N real executor JVMs (local-cluster mode) — and records throughput at
both plus efficiency = tput(4N) / (4 × tput(N)) in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "kg_sentence_triples",
    "kg_document_triples",
    "kg_fallback_ratio",
    "kg_mentions",
    "cc_canonicalize",
    "a1_posneg_ratio",
    "w1_turn_order",
    "sessionize",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_cosine_topk",
    "mm_image_meta",
    "tpch_q1_pricing",
    "tpch_q3_revenue",
    "asof_last_purchase",
    "graph_pagerank",
    "curate_contamination",
    "dedup_embedding",
    "a6_model_fuzzy",
    "stats_hist_profile",
    "ann_lsh_topk",
    # new in round 4b (extend, never replace, so round-over-round deltas on
    # the shared prefix stay comparable)
    "sketch_cms_heavy_hitters",
    "sketch_bloom_contamination",
    "text_tfidf_topk",
    "kg_entity_carryover",
    "ann_pq_topk",
    # new in round 4c
    "dedup_semantic",
    "text_dup_substring",
    "text_bm25",
    "kg_triple_type_check",
    "text_ngram_lm",
    "curate_chunk_documents",
    "events_scd2",
    "curate_group_cap",
    "text_lm_score",
    "events_rolling",
    "curate_temperature_sample",
    "text_bpe_pairs",
    "events_outliers",
    # new in round 5
    "mm_frame_index_real",
    "kg_multiturn_phrase_edges",
    "graph_negative_samples",
    "kg_mention_contexts",
    "graph_random_walks",
    "text_mlm_mask",
    "graph_skipgram_pairs",
    "kg_sft_pairs",
]


def run_headline(sf_dir: str, cpus: int) -> tuple[dict[str, float], dict[str, list[float]]]:
    from kgx import session
    from kgx.queries import REGISTRY

    spark = session.get_spark(
        "kgx-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    # Warm up JVM codegen + the Arrow python-worker pool once so per-query
    # timings measure the operators, not session cold-start (~14s).
    import pyspark.sql.functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s * 2

    warm = spark.range(1000).withColumn("y", _warm("id"))
    warm.join(F.broadcast(spark.range(10)), "id").groupBy().sum("y").collect()

    # Warm EVERY headline plan's whole-stage codegen on tiny table copies:
    # identical expression trees compile to identical generated source, so
    # the timed runs hit the Janino cache and measure execution, not
    # compilation (~9s one-time compile for the extraction plan and ~10s
    # for the 60-column SimHash agg, measured at local[32]).
    import shutil
    import tempfile

    from kgx.queries import _KG_CACHE

    warm_dir = tempfile.mkdtemp(prefix="kgx_warm_")
    try:
        for tbl in ("documents", "part", "embeddings", "events",
                    "lineitem", "orders", "customer"):
            spark.read.parquet(f"{sf_dir}/{tbl}.parquet").limit(30).write.mode(
                "overwrite"
            ).parquet(f"{warm_dir}/{tbl}.parquet")
        for qn in HEADLINE:
            try:
                REGISTRY[qn][0](spark, warm_dir).count()
            except Exception as e:  # pragma: no cover - warm best-effort
                print(f"  warm {qn} failed: {e}", file=sys.stderr)
    finally:
        for _sp, facts, _tf in _KG_CACHE.values():
            facts.unpersist()
            for cached in getattr(facts, "_kgx_persisted", []):
                cached.unpersist()
        _KG_CACHE.clear()
        shutil.rmtree(warm_dir, ignore_errors=True)

    # >=3 timed passes, MEDIAN per query (round-4 methodology fix): round 3
    # shipped single-effective-pass numbers on a bursty shared host, which
    # made a uniform ~1.33x host-load slowdown indistinguishable from a code
    # regression. The median over N passes is robust to one-sided load
    # bursts without the min's flattery, and the per-query pass lists are
    # published so spread is visible (a real regression moves the whole
    # distribution; host noise widens it). Every pass starts cold: ALL
    # persisted intermediates are dropped between passes (Spark's
    # CacheManager plan-matches otherwise and later passes would read the
    # first pass's persisted indexes — warm-cache numbers, not operator
    # cost). Codegen stays warm across passes (intended: compilation is
    # one-time in any long-lived deployment).
    n_passes = int(os.environ.get("BENCH_PASSES", "3"))
    passes: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for pass_i in range(n_passes):
        for name in HEADLINE:
            fn, _sql = REGISTRY[name]
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = round(time.monotonic() - t0, 3)
            # release caches the query handed us ownership of (the
            # sentence_facts/_kgx_persisted contract) so they don't leak
            # into later queries' memory budget within a pass
            for cached in getattr(df, "_kgx_persisted", []):
                cached.unpersist()
            passes[name].append(dt)
            print(f"  {name}[{pass_i}]: {dt:.2f}s ({n} rows)", file=sys.stderr)
        _KG_CACHE.clear()
        spark.catalog.clearCache()
    spark.stop()
    timings = {
        name: round(statistics.median(ts), 3) for name, ts in passes.items()
    }
    return timings, passes


SCALE_N = int(os.environ.get("BENCH_SCALE_N", "1"))
SCALE_4N = 4 * SCALE_N
SCALE_EXEC_CORES = int(os.environ.get("BENCH_SCALE_EXEC_CORES", "2"))
# "executors": local-cluster[N,C,3072] vs local-cluster[4N,C,3072] — real
# separate executor JVMs, the north rule's literal N vs 4N executors.
# "threads": local[N] vs local[4N] (per-core sweep mode).
SCALE_MODE = os.environ.get("BENCH_SCALE_MODE", "executors")
SCALE_TURNS = int(os.environ.get("BENCH_SCALE_TURNS", "5000000"))
# EQUAL trial counts per config: the estimator is the per-config MEDIAN
# wall, and unequal draw counts with a min estimator systematically
# flatter the config given more draws (round 2's 1.165 "superlinear"
# efficiency was exactly that — min-of-3 vs min-of-5 under bursty load).
SCALE_TRIALS_N = int(os.environ.get("BENCH_SCALE_TRIALS_N", "4"))
SCALE_TRIALS_4N = int(os.environ.get("BENCH_SCALE_TRIALS_4N", "4"))


def _spin(q, dur: float) -> None:
    t_end = time.monotonic() + dur
    n = 0
    while time.monotonic() < t_end:
        for _ in range(10000):
            pass
        n += 10000
    q.put(n)


def _effective_cores(nproc: int, dur: float = 1.5) -> float:
    """Measured parallel speedup of nproc pure-CPU spin processes over one:
    a direct, Spark-independent read of how many physical cores the
    hypervisor is ACTUALLY backing right now. On this box loadavg cannot
    see co-tenant pressure (it counts our runnable tasks only): during one
    round-5 degraded window the 8-core KG trial ran 65-125s vs its 35s
    healthy wall while loadavg looked normal — this probe is what
    distinguishes those windows (it read 7.65/8 minutes after the window
    passed)."""
    import multiprocessing as mp

    def rate(k: int) -> float:
        q = mp.Queue()
        ps = [mp.Process(target=_spin, args=(q, dur)) for _ in range(k)]
        for p in ps:
            p.start()
        tot = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        return tot / dur

    base = rate(1)
    return round(rate(nproc) / base, 2) if base else 0.0


def _mem_bw_gbs(nproc: int = 8, dur: float = 1.0) -> float:
    """Aggregate memory-streaming throughput (GB/s) of nproc processes each
    repeatedly summing a 64 MB float64 array. RECORDED, not thresholded:
    round 5 observed a second kind of degraded window the spin gate cannot
    see — 2-core Spark trials slowed 40% while spin capacity read 7-8/8
    effective cores, i.e. co-tenant MEMORY-BANDWIDTH pressure (the spin
    loop barely touches memory; Spark is bandwidth-hungry). Publishing this
    number per gate lets a reader classify such windows in the record."""
    import multiprocessing as mp

    def stream(q, dur):
        import numpy as np

        a = np.ones(8 * 1024 * 1024, dtype=np.float64)  # 64 MB
        t_end = time.monotonic() + dur
        n = 0
        while time.monotonic() < t_end:
            a.sum()
            n += 1
        q.put(n * a.nbytes)

    q = mp.Queue()
    ps = [mp.Process(target=stream, args=(q, dur)) for _ in range(nproc)]
    for p in ps:
        p.start()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return round(tot / dur / 1e9, 1)


GATE_MIN_FRAC = float(os.environ.get("BENCH_GATE_MIN_FRAC", "0.75"))
GATE_MAX_WAIT = float(os.environ.get("BENCH_GATE_MAX_WAIT", "600"))


def _capacity_gate(need_cores: int) -> dict:
    """Pre-trial host-health gate: before each scaling PAIR, require the
    host to demonstrably deliver >= GATE_MIN_FRAC * need_cores effective
    cores to a raw spin probe, waiting (bounded, 45s steps) for a degraded
    co-tenant window to pass. Honest by construction: the gate runs BEFORE
    the pair, never discards a completed trial, and every check — including
    a gave_up=True timeout after which the pair runs anyway — is published
    in the scaling record."""
    t0 = time.monotonic()
    checks: list[float] = []
    while True:
        eff = _effective_cores(need_cores)
        checks.append(eff)
        if eff >= GATE_MIN_FRAC * need_cores:
            return {"effective_cores": eff, "checks": checks,
                    "mem_bw_gbs": _mem_bw_gbs(need_cores),
                    "waited_s": round(time.monotonic() - t0, 1),
                    "gave_up": False}
        if time.monotonic() - t0 > GATE_MAX_WAIT:
            return {"effective_cores": eff, "checks": checks,
                    "mem_bw_gbs": _mem_bw_gbs(need_cores),
                    "waited_s": round(time.monotonic() - t0, 1),
                    "gave_up": True}
        print(f"    capacity gate: {eff}/{need_cores} effective cores, "
              f"waiting 45s for the degraded window to pass ...",
              file=sys.stderr)
        time.sleep(45)


def _gen_corpus(inp: str) -> None:
    from kgx import benchgen, session

    spark = session.get_spark("bench-gen", master="local[32]", shuffle_partitions=32)
    benchgen.write_bench_corpus(spark, inp, SCALE_TURNS)
    spark.stop()


def run_scaling() -> dict | None:
    """North-rule probe: the identical KG job on the identical corpus at N
    and 4N EXECUTORS (default local-cluster[1,2,3072] vs
    local-cluster[4,2,3072] — real separate executor JVMs with their own
    memory and Python worker pools, inter-process shuffle between them;
    the literal "N and 4N executors" of the north rule). Trials run
    PAIR-SEQUENTIALLY — N, 4N, N, 4N in time, one fresh warmed process
    per trial, exactly one cluster alive at a time (see probe() for the
    two failure modes this dodges). The primary estimator is the median
    of per-pair efficiencies; the ratio of per-config median walls is
    published alongside. BENCH_SCALE_MODE=threads falls back to the
    local[N]-vs-local[4N] per-core probe."""
    inp = f"/tmp/kgx_bench_{SCALE_TURNS}"
    if not os.path.exists(inp):
        print(f"  generating {SCALE_TURNS}-turn corpus ...", file=sys.stderr)
        _gen_corpus(inp)

    def probe(mode: str) -> dict | None:
        # PAIR-SEQUENTIAL trials (round-4 methodology fix, second
        # iteration). Two failure modes had to be dodged at once:
        #   1. All-N-then-all-4N (the r3 scheme) lets one external-load
        #      burst poison whichever config owned that time window (one
        #      293s outlier once produced a meaningless 0.31 "efficiency").
        #   2. Keeping BOTH clusters resident and interleaving trials
        #      (this round's first attempt) cross-contaminates: a 4N trial
        #      measured 45.7s with the 4N cluster alone but 91-116s with an
        #      idle 1N cluster resident — the co-resident JVMs/worker pools
        #      degrade the wider config disproportionately, and a
        #      sync+settle pause does NOT recover it.
        # So: trials alternate N, 4N, N, 4N in time (burst-fair at pair
        # granularity) but each trial runs in a FRESH process and exactly
        # one cluster is alive at any moment. Each process warms codegen +
        # Arrow workers on a file-subset read (identical plan shape), then
        # times ONE full trial. Estimator: per-config MEDIAN over an EQUAL
        # number of trials; per-trial 1-min loadavg is recorded so external
        # load is visible in the published record.
        pairs = min(SCALE_TRIALS_N, SCALE_TRIALS_4N)
        walls: dict[int, list[float]] = {SCALE_N: [], SCALE_4N: []}
        loads: dict[int, list[float]] = {SCALE_N: [], SCALE_4N: []}
        gates: list[dict] = []
        last: dict[int, dict] = {}
        need = SCALE_4N * (SCALE_EXEC_CORES if mode == "executors" else 1)
        for t in range(pairs):
            gate = _capacity_gate(need)
            gates.append(gate)
            print(f"    pair {t} capacity gate: {gate['effective_cores']}"
                  f"/{need} effective cores (waited {gate['waited_s']}s"
                  f"{', GAVE UP' if gate['gave_up'] else ''})",
                  file=sys.stderr)
            for n in (SCALE_N, SCALE_4N):
                if mode == "executors":
                    args = ["--executors", str(n),
                            "--exec-cores", str(SCALE_EXEC_CORES)]
                    desc = f"local-cluster[{n},{SCALE_EXEC_CORES},3072]"
                else:
                    args = ["--cpus", str(n)]
                    desc = f"local[{n}]"
                out = subprocess.run(
                    [sys.executable, "-m", "kgx.bench_scale",
                     *args, "--input", inp, "--trials", "1"],
                    capture_output=True,
                    text=True,
                    cwd=REPO,
                    timeout=2400,
                )
                if out.returncode != 0:
                    print(out.stderr[-2000:], file=sys.stderr)
                    return None
                line = [l for l in out.stdout.strip().splitlines()
                        if l.startswith("{")][-1]
                r = json.loads(line)
                walls[n].append(r["wall_sec"])
                loads[n].extend(r.get("trial_loadavg", []))
                last[n] = r
                print(f"    pair {t} {desc}: {r['wall_sec']}s "
                      f"(load {r.get('trial_loadavg')})", file=sys.stderr)
            # post-pair capacity reading: a degraded window can ARRIVE
            # mid-pair after the gate passed; publishing capacity on both
            # edges of the pair makes that visible per-pair instead of
            # silently folding it into the efficiency median
            gate["post_pair_effective_cores"] = _effective_cores(need)
            gate["post_pair_mem_bw_gbs"] = _mem_bw_gbs(need)

        results = {}
        for n in (SCALE_N, SCALE_4N):
            r = dict(last[n])
            wall = round(statistics.median(walls[n]), 3)
            r["wall_sec"] = wall
            r["wall_min_sec"] = min(walls[n])
            r["trial_walls"] = walls[n]
            r["trial_loadavg"] = loads[n]
            r["turns_per_sec"] = round(r["turns"] / wall, 1)
            r["triples_per_sec"] = round(r["triples"] / wall, 1)
            results[n] = r
            print(f"    {json.dumps(r)}", file=sys.stderr)
        # PRIMARY estimator: median of PER-PAIR efficiencies. Each pair's
        # two trials share a time window, so host-state drift (this VM's
        # 1N walls range 126-198s across a quiet hour — hypervisor-level
        # variance, loadavg stays flat) hits both sides of a ratio and
        # cancels; the ratio-of-config-medians does not exploit the
        # pairing and mixes fast-window N walls with slow-window 4N walls.
        # Both are published.
        pair_effs = [
            round((wn / w4) / 4, 3)
            for wn, w4 in zip(walls[SCALE_N], walls[SCALE_4N])
        ]
        eff_pairwise = round(statistics.median(pair_effs), 3)
        eff = results[SCALE_4N]["turns_per_sec"] / (4 * results[SCALE_N]["turns_per_sec"])
        return {
            "mode": mode,
            "n_cores": SCALE_N,
            "n4_cores": SCALE_4N,
            "interleaved_pairs": pairs,
            "pair_capacity_gates": gates,
            "localN": results[SCALE_N],
            "local4N": results[SCALE_4N],
            "pair_efficiencies": pair_effs,
            "scaling_efficiency": eff_pairwise,
            "scaling_efficiency_config_medians": round(eff, 3),
        }

    # executor mode is the primary evidence; fall back to the thread probe
    # rather than record nothing if local-cluster can't start here
    modes = [SCALE_MODE] + (["threads"] if SCALE_MODE == "executors" else [])
    for mode in modes:
        r = probe(mode)
        if r is not None:
            return r
    return None


def write_baseline_md(scaling: dict, sf: str) -> None:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    rn, r4n = scaling["localN"], scaling["local4N"]
    n, n4 = scaling["n_cores"], scaling["n4_cores"]
    cfg_n = rn.get("master", f"local[{n}]")
    cfg_4n = r4n.get("master", f"local[{n4}]")
    md = f"""# BENCH/BASELINE — measured results

## Scaling efficiency (north rule: N → 4N workers, target ≥ 0.8)

Identical KG-extraction job (assemble → Arrow-UDF mentions → relations →
linking → aggregation → triples) on the identical synthetic transcript
corpus ({rn["turns"]} turns), two parallelism levels, separate processes.
Trials alternate N, 4N, N, 4N in TIME (so an external-load burst lands
on both configs, not just whichever owned that window — the r3 scheme's
flaw), but each trial runs in a FRESH process with exactly ONE cluster
alive at a time (keeping both clusters resident and interleaving inside
them cross-contaminates: a 4N trial measured 45.7s with its cluster
alone vs 91-116s with an idle 1N cluster co-resident, and a sync+settle
pause does not recover it). Each process warms whole-stage codegen and
the Arrow python workers on a file-subset read whose plan shape is
identical to the full trial's (limit()-based warmup leaves the real
plan's codegen cold), then times ONE full-corpus run. Per config: an
EQUAL number of timed trials; the headline wall is the per-config MEDIAN
(robust to one-sided bursts without the min's flattery); the min, the
full trial distribution, and the per-trial 1-min loadavg are shown so
external-load contamination is visible in the record. The bar is ≥0.8:

| config | median wall (s) | min wall (s) | trial walls | per-trial 1-min loadavg | turns/s | triples/s |
|---|---|---|---|---|---|---|
| {cfg_n}  | {rn["wall_sec"]} | {rn.get("wall_min_sec", rn["wall_sec"])} | {rn.get("trial_walls")} | {rn.get("trial_loadavg")} | {rn["turns_per_sec"]} | {rn["triples_per_sec"]} |
| {cfg_4n} | {r4n["wall_sec"]} | {r4n.get("wall_min_sec", r4n["wall_sec"])} | {r4n.get("trial_walls")} | {r4n.get("trial_loadavg")} | {r4n["turns_per_sec"]} | {r4n["triples_per_sec"]} |

**efficiency = median over pairs of tput(4N)/(4 × tput(N)) =
{scaling["scaling_efficiency"]}** (per-pair efficiencies:
{scaling.get("pair_efficiencies")}; the ratio of config-median
throughputs = {scaling.get("scaling_efficiency_config_medians")} is
published alongside). The per-pair median is the declared primary
estimator: each pair's two trials share a time window, so host-state
drift — this VM's 1N walls ranged 126-198s across one otherwise-idle
hour with flat loadavg, i.e. hypervisor-level variance — hits both
sides of the ratio and cancels, while a ratio of config medians mixes
fast-window N walls with slow-window 4N walls.

Each pair is preceded by a CAPACITY GATE (round-5 methodology fix): a raw
multiprocess spin probe must demonstrate the host can actually deliver
the 4N trial's core demand (>= 75% effective) before the pair starts,
waiting out degraded co-tenant windows in bounded 45s steps (<= 600s,
then the pair runs anyway with gave_up=true published). Round 5 measured
why this is necessary: in one degraded window the 8-core trial walls were
65-125s vs the 35s healthy wall while 1N walls moved <15% and loadavg
stayed normal — co-tenant physical-core pressure is invisible to loadavg
and asymmetric, so it reads as a scaling collapse. A SECOND window kind
slows even 2-core trials ~40% while spin capacity reads healthy —
co-tenant memory-bandwidth pressure — so each gate also RECORDS an
aggregate memory-streaming throughput (mem_bw_gbs; healthy box ~84 GB/s
at 8 procs, recorded 2026-08-19) without thresholding on it. The gate is
pre-trial (never discards a completed measurement) and every check is
published: pair gates this run =
{json.dumps(scaling.get("pair_capacity_gates"))}.

Default probe mode is EXECUTORS: local-cluster[N,2,3072] runs N real
executor JVMs — each with its own 3 GB heap and its own Arrow
python-worker pool, shuffling between processes — so N → 4N here is
literally "N executors vs 4N executors" (the north rule's phrasing), not
thread-level parallelism inside one JVM. The thread-mode per-core sweep
(BENCH_SCALE_MODE=threads; see BENCH/SCALE.md) corroborates: per-core
throughput holds ~0.95 from 1→4 cores before the 32-core shared host's
memory-bandwidth + external-load wall — single-host contention a real
multi-executor cluster does not have.

## Headline per-query timings

See BENCH_r*.json (driver-recorded, sf={sf}).
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    timings, passes = run_headline(sf_dir, cpus)
    total = round(sum(timings.values()), 3)

    skew = None
    if os.environ.get("BENCH_SKIP_SKEW") != "1":
        try:
            from kgx import bench_skew, session

            sp = session.get_spark(
                "kgx-skew", master=f"local[{cpus}]", shuffle_partitions=cpus
            )
            skew = bench_skew.run_skew_probe(sp)
            bench_skew.write_skew_md(skew, os.path.join(REPO, "BENCH", "SKEW.md"))
            sp.stop()
        except Exception as e:  # pragma: no cover
            print(f"  skew probe failed: {e}", file=sys.stderr)

    scaling = None
    if os.environ.get("BENCH_SKIP_SCALING") != "1":
        try:
            scaling = run_scaling()
        except Exception as e:  # pragma: no cover
            print(f"  scaling probe failed: {e}", file=sys.stderr)
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_passes": passes,
        "estimator": f"median of {len(next(iter(passes.values())))} cold-cache passes per query",
        "note": (
            "r3's 1.33x uniform slowdown vs r2 was single-pass timing on a "
            "bursty shared host (untouched queries moved in lockstep; pytest "
            "itself ran 2.4x slower that session); medians-of-3 with "
            "published per-pass spreads make host noise visible and "
            "distinguishable from plan regressions from r4 on. "
            "asof_last_purchase (r3's only >2x mover, code unchanged since "
            "r1) is dispositioned by the same medians: see its pass spread."
        ),
        "sf": sf,
    }
    if skew:
        payload["skew"] = skew
    if scaling:
        payload["scaling"] = scaling
        write_baseline_md(scaling, sf)
    # Full detail (per-pass lists, skew probe, scaling trials) goes to the
    # BENCH/ file; the FINAL stdout line is a compact headline the driver can
    # capture whole. Round 4's driver record came back `parsed: null` because
    # this line carried the full payload and outgrew the driver's 2,000-char
    # tail capture — the numbers existed only in BENCH/BENCH_local.json.
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BENCH_local.json"), "w") as f:
        json.dump(payload, f, indent=1)
    headline = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": {n: round(v, 2) for n, v in timings.items()},
        "sf": sf,
        "detail": "BENCH/BENCH_local.json",
    }
    if scaling:
        headline["scaling_efficiency"] = scaling.get("scaling_efficiency")
        headline["triples_per_sec_4n"] = scaling.get("local4N", {}).get(
            "triples_per_sec"
        )
    if skew:
        headline["skew_flatten_factor"] = skew.get("max_group", {}).get(
            "flatten_factor"
        )
    line = json.dumps(headline, separators=(",", ":"))
    if len(line) > 1900:  # stay under the driver's tail capture no matter what
        headline.pop("skew_flatten_factor", None)
        headline["queries"] = {
            n: round(v, 1) for n, v in sorted(
                timings.items(), key=lambda kv: -kv[1]
            )[:30]
        }
        headline["queries_truncated_to_slowest"] = 30
        line = json.dumps(headline, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
