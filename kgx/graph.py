"""Graph analytics over the materialized KG / relational edge sets.

The reference stores its graph in SQL Server and never analyzes it; these
are the first-class graph queries a KG consumer runs on the output
(degree profile, centrality, neighborhood expansion). All are pure
DataFrame compositions designed for 10^9+-edge graphs:

  * the edge list is the only big table; it is hash-partitioned by `src`
    once and persisted, so every per-iteration join co-locates on the
    same exchange;
  * rank/degree tables are O(|V|) and flow through broadcast or shuffled
    hash joins as AQE decides;
  * PageRank uses EXACT integer arithmetic (rank mass 10^12 per node,
    integral `div`) so the result is bit-identical across engines and
    row orders — no float summation order dependence — making an
    unrolled-CTE DuckDB oracle possible (cf. the left-fold trick used in
    kgx/similarity.py for float dots).

Connected components (the canonicalization analogue) lives in
kgx/canonical.py; this module covers the read-side analytics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

R0 = 10**12  # integer rank mass per node (exact across engines)


def undirected_edges(pairs: DataFrame, left: str, right: str) -> DataFrame:
    """Distinct (left,right) pairs → symmetric string-keyed edge list.

    Node ids are namespaced ('c<id>' / 's<id>') so a bipartite pair table
    becomes one homogeneous graph.
    """
    e = pairs.select(
        F.concat(F.lit("c"), F.col(left).cast("string")).alias("c"),
        F.concat(F.lit("s"), F.col(right).cast("string")).alias("s"),
    ).distinct()
    return e.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        e.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of a symmetric edge list (one shuffle)."""
    return edges.groupBy("src").agg(F.count("*").alias("deg"))


def degree_histogram(edges: DataFrame) -> DataFrame:
    """degree -> node count (two partial-aggregated shuffles)."""
    return (
        degrees(edges)
        .groupBy("deg")
        .agg(F.count("*").alias("n_nodes"))
        .select(F.col("deg").cast("bigint").alias("deg"), "n_nodes")
    )


def pagerank_int(edges: DataFrame, iters: int = 3, r0: int = R0) -> DataFrame:
    """Exact integer PageRank (damping 0.85) over a symmetric edge list.

    rank'(v) = (15*r0) div 100  +  (85 * Σ_{u→v} (rank(u) div deg(u))) div 100

    All quantities are BIGINTs and `div` is integral division, so the
    fixed-iteration result is exactly reproducible in any engine and any
    aggregation order (sum of integers is associative). Per iteration:
    one join of the O(|V|) rank table onto the pre-partitioned edge list
    + one groupBy(dst) — two exchanges, both on node keys; skewed hubs
    are split by AQE. Edges are persisted once; rank tables are tiny
    relative to edges and never hold floats.
    """
    edges = edges.repartition(edges.sparkSession.sparkContext.defaultParallelism, "src").persist()
    deg = degrees(edges).persist()
    base = (15 * r0) // 100
    ranks = deg.select("src", F.lit(r0).cast("bigint").alias("r"), "deg")
    for _ in range(iters):
        contrib = edges.join(ranks, "src").select(
            F.col("dst").alias("node"), F.expr("r div deg").alias("c")
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = deg.join(sums, deg["src"] == sums["node"], "left").select(
            deg["src"],
            (F.lit(base) + F.expr("(85 * coalesce(s, 0)) div 100")).cast("bigint").alias("r"),
            deg["deg"],
        )
    out = ranks.select(F.col("src").alias("node"), F.col("r").alias("rank"))
    edges.unpersist()
    deg.unpersist()
    return out


def two_hop_counts(edges: DataFrame, sources: DataFrame) -> DataFrame:
    """#distinct 2-hop neighbors per source node (excluding the source).

    sources: DataFrame[node]. Two self-equi-joins on the symmetric edge
    list with a semi-join prefilter — the source set prunes the first hop
    before any fan-out, so cost is O(Σ_{s∈sources} Σ_{m∈N(s)} deg(m)),
    never the full deg² blowup of an unrestricted 2-hop.
    """
    hop1 = edges.join(sources.withColumnRenamed("node", "src"), "src").select(
        F.col("src").alias("origin"), F.col("dst").alias("mid")
    )
    hop2 = hop1.join(
        edges.select(F.col("src").alias("mid"), F.col("dst").alias("nbr2")), "mid"
    ).filter(F.col("nbr2") != F.col("origin"))
    return hop2.groupBy("origin").agg(
        F.countDistinct("nbr2").alias("n_two_hop")
    )
