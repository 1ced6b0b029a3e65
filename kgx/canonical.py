"""Stage 5 — entity canonicalization via connected components.

The reference canonicalizes entities sequentially: Hibernate get-or-create
with first-writer-wins — later mentions with an equal (name, uri) merge into
the first row's id (DatabaseFacade.java:987-1018, ORDER BY id ASC).
Reproducing that under parallelism needs an order-independent rule:

  * two nodes are candidate-equivalent iff they share lower(name) OR share
    a non-null uri (default blocking="name_or_uri");
  * the canonical id of a component is its MINIMUM entity_id (entity_id is
    already a deterministic content hash, so min is stable across runs) —
    the deterministic analogue of "first id wins".

Blocking policy note: the reference's get-or-create requires name AND
ontologyConceptUri equality (DatabaseFacade.java createOrgetSO), and exact
(name, uri) duplicates already collapse via the deterministic hash ids
before CC ever runs. The default OR-rule is therefore an INTENTIONAL,
strictly stronger entity-resolution policy — it additionally merges
same-name/different-uri and same-uri/different-name nodes and their
transitive chains, which the reference would keep distinct. Pass
blocking="name_and_uri" for exact reference parity (under hash ids that
yields no extra merges: every component is a singleton).

Algorithm: star-contraction + alternating min-label propagation — each
blocking key (lower(name), uri) emits edges member→min(member ids) (never
O(group²)), then labels propagate to the component minimum, iterating to
fixpoint with localCheckpoint to truncate lineage (the standard DataFrame
rendering of large-star/small-star, Kiveris et al. 2014, "Connected
Components in MapReduce and Beyond").

Scale: the node table is |distinct entities| — orders of magnitude smaller
than the turn table. Hot blocking keys (e.g. one surface shared by millions
of unlinked mentions) are already collapsed to a single node by the
deterministic hash ids, so group sizes stay bounded; AQE skew-join splitting
covers the residue.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def candidate_edges(nodes: DataFrame, blocking: str = "name_or_uri") -> DataFrame:
    """Star edges (src > dst) from the blocking keys.

    blocking="name_or_uri" (default): merge on shared lower(name) OR shared
    uri — the intentional stronger dedup policy (see module docstring).
    blocking="name_and_uri": reference-exact get-or-create equality on the
    (lower(name), coalesce(uri, '')) pair."""
    def star(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.size("ids") > 1)
            .withColumn("dst", F.array_min("ids"))
            .select(F.explode("ids").alias("src"), "dst")
            .filter(F.col("src") != F.col("dst"))
        )

    if blocking == "name_and_uri":
        pair = (
            nodes.filter(F.col("name").isNotNull())
            .groupBy(
                F.lower("name").alias("k_name"),
                F.coalesce("uri", F.lit("")).alias("k_uri"),
            )
            .agg(F.collect_set("entity_id").alias("ids"))
        )
        return star(pair).distinct()
    if blocking != "name_or_uri":
        raise ValueError(f"unknown blocking policy: {blocking}")
    by_name = (
        nodes.filter(F.col("name").isNotNull())
        .groupBy(F.lower("name").alias("k"))
        .agg(F.collect_set("entity_id").alias("ids"))
    )
    by_uri = (
        nodes.filter(F.col("uri").isNotNull())
        .groupBy(F.col("uri").alias("k"))
        .agg(F.collect_set("entity_id").alias("ids"))
    )
    return star(by_name).unionByName(star(by_uri)).distinct()


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 64
) -> DataFrame:
    """Return nodes + canonical_id = min entity_id of the component.

    Min-label propagation WITH pointer jumping: each round folds in
    comp(comp(v)) alongside the neighbor minima, so label distance to the
    component minimum halves per round — convergence in O(log diameter)
    rounds instead of O(diameter) (plain propagation measurably did NOT
    converge within 15 rounds on a 20k-node chain-heavy blocking graph).
    Runs to fixpoint; max_iter is a safety valve (2^64 exceeds any diameter)
    and raises if ever hit rather than returning unconverged labels.

    Seeding: candidate_edges already points every block member at its
    block minimum, so comp(v) is initialized to min(v, min dst over v's
    star edges) BEFORE the loop. On blocking graphs (tiny component
    diameter — components only chain through nodes sharing several keys)
    most inputs then converge in 1-2 rounds instead of ~6, and the
    convergence check runs every round to stop at the first fixpoint.
    """
    # seed: one small agg over the star edges (src > dst ⇒ min dst < src)
    seed = edges.groupBy(F.col("src").alias("entity_id")).agg(
        F.min("dst").alias("seed_comp")
    )
    labels = (
        nodes.select("entity_id")
        .join(seed, "entity_id", "left")
        .select(
            "entity_id",
            F.coalesce("seed_comp", F.col("entity_id")).alias("comp"),
        )
    )
    labels = labels.localCheckpoint(eager=True)
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)

    # Convergence check: labels only ever decrease (min-propagation), so
    # sum(comp) strictly decreases until fixpoint — one cheap aggregate on
    # the new labels instead of a join-against-previous per iteration
    # (decimal(38,0) sum is exact and overflow-free).
    def _label_sum(lbl: DataFrame):
        return lbl.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    converged = False
    for _it in range(max_iter):
        # comp'(v) = min(comp(v), comp(comp(v)), min over neighbors comp(u))
        neigh = (
            sym.join(labels, sym["dst"] == labels["entity_id"], "inner")
            .select(sym["src"].alias("entity_id"), F.col("comp"))
        )
        l1, l2 = labels.alias("l1"), labels.alias("l2")
        jump = l1.join(l2, F.col("l1.comp") == F.col("l2.entity_id")).select(
            F.col("l1.entity_id").alias("entity_id"), F.col("l2.comp").alias("comp")
        )
        labels = (
            labels.unionByName(neigh)
            .unionByName(jump)
            .groupBy("entity_id")
            .agg(F.min("comp").alias("comp"))
        )
        labels = labels.localCheckpoint(eager=True)
        s = _label_sum(labels)
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:  # pragma: no cover - safety valve
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return nodes.join(labels, "entity_id").withColumnRenamed("comp", "canonical_id")


def build_nodes(triples: DataFrame) -> DataFrame:
    """Distinct entity nodes from the triple facts (first-wins attributes)."""
    return (
        triples.groupBy(F.col("subj_id").alias("entity_id"))
        .agg(
            # ordering must be unique per distinct attribute tuple or
            # ties (e.g. two casings of one name in one turn) make the
            # NODES output flap between runs; name/uri extend the
            # (conv, turn) key to a deterministic total order
            F.min_by(
                F.struct(
                    F.col("subj_name").alias("name"),
                    F.col("subj_uri").alias("uri"),
                    F.col("subj_type").alias("entity_type"),
                ),
                F.struct("conv_id", "turn_idx", "subj_name", "subj_uri"),
            ).alias("a")
        )
        .select("entity_id", "a.name", "a.uri", "a.entity_type")
    )


def block_memberships(nodes: DataFrame, blocking: str = "name_or_uri") -> DataFrame:
    """(entity_id, k) membership rows of the blocking HYPERGRAPH: one row
    per node per blocking key it belongs to (k is namespaced so a name
    never collides with a uri). Connectivity is identical to the star-edge
    graph of candidate_edges — two nodes are connected iff they share a
    key — but propagation over memberships diffuses a min label across an
    entire block in ONE round, instead of walking block-min chains."""
    by_name = nodes.filter(F.col("name").isNotNull()).select(
        "entity_id", F.concat(F.lit("n:"), F.lower("name")).alias("k")
    )
    if blocking == "name_and_uri":
        # hash each part before concatenating: a raw 'name|uri' string is
        # delimiter-injectable (name='a|b', uri='c' would collide with
        # name='a', uri='b|c' and spuriously merge distinct pairs); md5 is
        # fixed-length, so 'p:<32 hex>|<32 hex>' is a bijective encoding
        return nodes.filter(F.col("name").isNotNull()).select(
            "entity_id",
            F.concat(
                F.lit("p:"), F.md5(F.lower("name")), F.lit("|"),
                F.md5(F.coalesce("uri", F.lit(""))),
            ).alias("k"),
        )
    if blocking != "name_or_uri":
        raise ValueError(f"unknown blocking policy: {blocking}")
    by_uri = nodes.filter(F.col("uri").isNotNull()).select(
        "entity_id", F.concat(F.lit("u:"), F.col("uri")).alias("k")
    )
    return by_name.unionByName(by_uri)


def connected_components_blocks(
    nodes: DataFrame, memberships: DataFrame, max_iter: int = 64
) -> DataFrame:
    """Connected components over the blocking hypergraph: per round,
    every block takes the min label of its members and hands it back to
    every member (two keyed aggregations), composed with pointer jumping
    comp(comp(v)). Convergence is governed by the BLOCK-graph diameter —
    typically 2-5 on entity-resolution blocking (blocks overlap densely) —
    versus the node-graph diameter that plain edge propagation walks
    (measured: 19 rounds → 3 rounds, ~12s → ~4s on the sf0.1 benchmark
    graph). Same fixpoint: the component minimum.

    Scale: memberships is one row per (node, key) — about 2|V| for
    name+uri blocking; each round shuffles it by k and by entity_id, both
    standard partial-aggregated min aggs (hot blocks combine map-side)."""
    labels = nodes.select("entity_id", F.col("entity_id").alias("comp"))
    mem = memberships.localCheckpoint(eager=True)

    def _label_sum(lbl: DataFrame):
        return lbl.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = None
    converged = False
    for _it in range(max_iter):
        joined = mem.join(labels, "entity_id")
        bmin = joined.groupBy("k").agg(F.min("comp").alias("bcomp"))
        via_blocks = (
            mem.join(bmin, "k")
            .groupBy("entity_id")
            .agg(F.min("bcomp").alias("comp"))
        )
        l1, l2 = labels.alias("l1"), labels.alias("l2")
        jump = l1.join(l2, F.col("l1.comp") == F.col("l2.entity_id")).select(
            F.col("l1.entity_id").alias("entity_id"), F.col("l2.comp").alias("comp")
        )
        labels = (
            labels.unionByName(via_blocks)
            .unionByName(jump)
            .groupBy("entity_id")
            .agg(F.min("comp").alias("comp"))
        )
        labels = labels.localCheckpoint(eager=True)
        s = _label_sum(labels)
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:  # pragma: no cover - safety valve
        raise RuntimeError(
            f"connected_components_blocks did not converge in {max_iter} rounds"
        )
    return nodes.join(labels, "entity_id").withColumnRenamed("comp", "canonical_id")


def canonicalize(triples: DataFrame, blocking: str = "name_or_uri") -> DataFrame:
    """nodes table with canonical_id (NODES schema)."""
    nodes = build_nodes(triples)
    mem = block_memberships(nodes, blocking=blocking)
    cc = connected_components_blocks(nodes, mem)
    return cc.select("entity_id", "canonical_id", "name", "uri", "entity_type")


def fact_fusion(
    triples: DataFrame,
    key_cols: tuple[str, str] = ("subj_uri", "pred"),
    vote_col: str = "obj_polarity",
) -> DataFrame:
    """Majority-vote knowledge fusion (the truth-discovery baseline of
    Dong et al. 2014's knowledge-fusion survey): the extractor emits one
    triple PER EVIDENCE OCCURRENCE, so the same (subject, predicate) can
    carry conflicting objects across conversations; fusion resolves each
    key to ONE fused value with an explicit confidence — the stage
    between raw extraction and a publishable KG that the reference
    pipeline lacks entirely (it stores every per-document sentiment row;
    conflict resolution is left to readers).

    Deterministic contract: winner = the vote value with the highest
    evidence count, ties to the SMALLEST value (total order, so the SQL
    oracle reproduces the pick); confidence = winner count / total count
    (one IEEE division of exact integers); n_alternatives counts the
    distinct competing values so downstream can threshold on
    disagreement, not just confidence.

    Shape: one evidence-sized shuffle (the groupBy on key+vote with
    map-side partials); the window pass that ranks winners runs over
    the VOTE table — bounded at (distinct vote values) rows per key,
    here <= 3 polarities — so its exchange moves vote counts, never
    evidence rows."""
    k = list(key_cols)
    votes = triples.groupBy(*k, vote_col).agg(
        F.count("*").cast("long").alias("n_votes_winner")
    )
    return fuse_votes(votes, key_cols=key_cols, vote_col=vote_col)


def fuse_votes(
    votes: DataFrame,
    key_cols: tuple[str, str] = ("subj_uri", "pred"),
    vote_col: str = "obj_polarity",
) -> DataFrame:
    """Winner pick over a PRE-AGGREGATED vote table (one row per
    key+value with its count in `n_votes_winner`) — the second half of
    fact_fusion, split out so incremental producers share it verbatim:
    vote counts are additive-mergeable, so a stream can maintain the
    vote table (kgx.streaming.fusion_stream) and publish fused facts at
    any point with exactly the batch operator's pick. Input rows for a
    duplicated key+value are summed first, so a delta-log vote table
    (one row per micro-batch per key+value) feeds this directly."""
    from pyspark.sql import Window

    k = list(key_cols)
    votes = votes.groupBy(*k, vote_col).agg(
        F.sum("n_votes_winner").cast("long").alias("n_votes_winner")
    )
    w = Window.partitionBy(*k).orderBy(
        F.col("n_votes_winner").desc(), F.col(vote_col).asc()
    )
    tot = Window.partitionBy(*k)
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_votes_total", F.sum("n_votes_winner").over(tot).cast("long")
        )
        .withColumn("n_alternatives", F.count("*").over(tot).cast("long"))
        .where(F.col("rn") == 1)
        .select(
            *k,
            F.col(vote_col).alias("fused_value"),
            "n_votes_winner",
            "n_votes_total",
            "n_alternatives",
            (
                F.col("n_votes_winner").cast("double")
                / F.col("n_votes_total").cast("double")
            ).alias("confidence"),
        )
    )


def fact_provenance(
    triples: DataFrame,
    key_cols: tuple[str, str] = ("subj_uri", "pred"),
    source_col: str = "conv_id",
    vote_col: str = "obj_polarity",
    sample_n: int = 5,
) -> DataFrame:
    """Per-fused-fact provenance: the evidence record a publishable KG
    must keep next to each fused value so a reader can audit WHY the
    graph asserts it (the reference keeps per-document rows as implicit
    provenance — DatabaseFacade.java stores every classification row —
    but never aggregates them into a per-fact evidence summary).

    For each (subject, predicate) key: total evidence rows, distinct
    source conversations, the per-polarity evidence distribution
    (n_pos/n_neg/n_neu — lets a reader see contested facts at a glance),
    and a deterministic sample of source ids (lexicographically first
    `sample_n` distinct sources, so the SQL oracle reproduces it exactly
    and the column is bounded at scale — never a full evidence list).

    Shape: ONE evidence-sized shuffle (the groupBy); collect_set is
    per-key and the slice bounds what survives the aggregation, so no
    key ever materializes unbounded state downstream. countDistinct
    rewrites to a two-level partial aggregate — no second job."""
    k = list(key_cols)
    pol = F.col(vote_col)
    return triples.groupBy(*k).agg(
        F.count("*").cast("long").alias("n_evidence"),
        F.countDistinct(source_col).cast("long").alias("n_sources"),
        F.sum((pol == "positive").cast("long")).alias("n_pos"),
        F.sum((pol == "negative").cast("long")).alias("n_neg"),
        F.sum((pol == "neutral").cast("long")).alias("n_neu"),
        F.concat_ws(
            ",", F.slice(F.sort_array(F.collect_set(source_col)), 1, sample_n)
        ).alias("source_sample"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, str] = ("subj_uri", "pred"),
    value_col: str = "fused_value",
) -> DataFrame:
    """KG snapshot diff: classify every (subject, predicate) key across
    two fused snapshots as added / removed / changed / unchanged — the
    maintenance primitive for periodically re-extracted graphs (publish
    only the delta; alert on mass removals). Inputs are FUSED snapshots
    (one row per key, e.g. fact_fusion output), so the join is on
    key-distinct sides.

    Shape: one full-outer shuffle join on the fused keys. Both sides are
    already one-row-per-key (fused), so the join is skew-free by
    construction — no fused key repeats; at production scale this is the
    right SortMergeJoin (neither snapshot is broadcastable)."""
    k = list(key_cols)
    o = old.select(*k, F.col(value_col).alias("old_value"))
    n = new.select(*k, F.col(value_col).alias("new_value"))
    j = o.join(n, on=k, how="full_outer")
    status = (
        F.when(F.col("old_value").isNull(), F.lit("added"))
        .when(F.col("new_value").isNull(), F.lit("removed"))
        .when(F.col("old_value") == F.col("new_value"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*k, "old_value", "new_value", status.alias("status"))
