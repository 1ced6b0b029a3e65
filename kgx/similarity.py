"""Similarity search over embedding columns (array<float>).

  * brute_force_topk — exact top-k by cosine or dot product: broadcast the
    (small) query set, score every row JVM-side, rank per query. The
    baseline and the verification oracle for the ANN variants.
  * ivf_topk — IVF-style scale path: assign rows to the nearest of C
    deterministic centroids (coarse quantizer), probe only the query's
    nprobe nearest cells. At 100 TB the cell assignment is a narrow map and
    the probe prunes >95% of the corpus before scoring.
  * lsh_topk — hash-partitioned scale path: corpus and queries share
    hyperplane band buckets (dedup.hyperplane_band_buckets), candidates =
    bucket co-membership, exact cosine ranks them; optional Hamming-1
    multi-probe (probe_flips=1) for recall.
  * pq_encode / pq_topk — product-quantization scale path: corpus
    compressed to m codes/vector, query-time ADC scores code tables
    instead of raw floats (the bytes-per-vector scan contract at 100 TB).

Dot products use F.zip_with + F.aggregate (whole-stage codegen). For exact
cross-engine oracle checks use metric="dot_decimal" (decimal accumulation is
order-independent and bit-stable across engines; float sums are not).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_decimal(a: Column, b: Column) -> Column:
    """Order-independent exact accumulation: cast elements to decimal before
    multiply/sum so the result is identical in any engine/row order."""
    prod = F.zip_with(
        a,
        b,
        lambda x, y: x.cast("decimal(20,10)") * y.cast("decimal(20,10)"),
    )
    return F.aggregate(
        prod,
        F.lit(0).cast("decimal(38,18)"),
        lambda acc, x: acc + x.cast("decimal(38,18)"),
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k: per query row, score against the whole corpus.

    `queries` is expected to be small — it is broadcast, so the corpus is
    scanned once with no shuffle of the corpus side; the only shuffle is the
    per-query top-k (rank on |queries| * |corpus| scored rows, bounded by
    the broadcast size).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    if metric == "cosine":
        sim = _dot(F.col("qvec"), F.col("cvec")) / (
            _norm(F.col("qvec")) * _norm(F.col("cvec"))
        )
    elif metric == "dot":
        sim = _dot(F.col("qvec"), F.col("cvec"))
    elif metric == "dot_decimal":
        sim = _dot_decimal(F.col("qvec"), F.col("cvec")).cast("decimal(38,10)")
    else:
        raise ValueError(metric)
    scored = scored.withColumn("sim", sim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _centroid_expr(
    ci: int, dim: int, centroids: list[list[float]] | None
) -> Column:
    """Centroid ci as an array<double> expression: an explicit literal row
    when `centroids` is given (cross-engine reproducible — a SQL oracle can
    embed the same literals), else the deterministic hash-derived ±1
    pseudo-centroid (sandbox stand-in for trained k-means centroids)."""
    if centroids is not None:
        return F.array(*[F.lit(float(v)) for v in centroids[ci]])
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (F.pmod(F.xxhash64(F.lit(ci), i), F.lit(2)) * 2 - 1).cast("double"),
    )


def assign_cells(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF coarse quantizer. Pass `dim` (or explicit `centroids`) to avoid
    the driver-side .first() probe — one fewer Spark job per query; the
    probe remains as a convenience fallback."""
    if centroids is not None:
        n_cells = len(centroids)
        dim = len(centroids[0])
    elif dim is None:
        dim = df.select(F.size(vec_col).alias("d")).first()["d"]

    sims = F.array(
        *[
            F.struct(
                _dot(F.col(vec_col), _centroid_expr(ci, dim, centroids)).alias("sim"),
                F.lit(ci).alias("cell"),
            )
            for ci in range(n_cells)
        ]
    )
    return df.withColumn("cell", F.array_max(sims)["cell"])


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Distributed Lloyd's k-means — trains the IVF coarse quantizer that
    assign_cells/ivf_topk previously stubbed with hash-derived ±1
    pseudo-centroids (the documented contract: centroids are driver-side
    literals, however obtained).

    Deterministic init: the k corpus vectors with the smallest
    xxhash64(id) (content-derived, order-independent). Each iteration:
      1. assign every row to its nearest centroid — a narrow map over the
         corpus (centroids are literal expressions, no join);
      2. new centroid = per-cell coordinate mean via posexplode →
         groupBy(cell, pos) — partial aggregation makes the shuffle
         O(k · dim · partitions), never O(corpus);
      3. collect the k·dim means to the driver (tiny by construction —
         that is what makes the quantizer broadcastable at any corpus
         size). Cells that lose all members keep their previous centroid.
    """
    if init_centroids is not None:
        cents = [list(map(float, c)) for c in init_centroids]
        k = len(cents)
    else:
        seeds = (
            df.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
            .orderBy("h")
            .limit(k)
            .collect()
        )
        cents = [[float(x) for x in r["v"]] for r in seeds]

    for _ in range(iters):
        assigned = assign_cells(df, id_col=id_col, vec_col=vec_col, centroids=cents)
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        for ci, coords in by_cell.items():
            new[ci] = [coords[p] for p in sorted(coords)]
        cents = new
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's `nprobe`
    best cells. Recall/cost dial = nprobe/n_cells. Pass `dim` or explicit
    `centroids` to skip the driver-side dimension probe."""
    if centroids is not None:
        n_cells = len(centroids)
        dim = len(centroids[0])
    elif dim is None:
        dim = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    c = assign_cells(corpus, n_cells, id_col, vec_col, dim, centroids).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cell"
    )

    cell_sims = F.array(
        *[
            F.struct(
                _dot(F.col(vec_col), _centroid_expr(ci, dim, centroids)).alias("sim"),
                F.lit(ci).alias("cell"),
            )
            for ci in range(n_cells)
        ]
    )
    q = queries.withColumn(
        "probe_cells",
        F.slice(
            F.reverse(F.array_sort(cell_sims)), 1, nprobe
        )["cell"],
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode("probe_cells").alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            _dot(F.col("qvec"), F.col("cvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
    n_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    max_bucket_size: int | None = None,
    probe_flips: int = 0,
) -> DataFrame:
    """LSH-bucketed ANN top-k — the hash-partitioned scale path beside
    ivf_topk (the brief's "IVF or LSH-bucketed variant").

    Corpus and query vectors hash to hyperplane band buckets
    (dedup.hyperplane_band_buckets — the same signature map the embedding
    near-dup dedup uses, so one pass over the corpus can serve both); a
    corpus row is a candidate for a query iff they share at least one band
    bucket. Exact cosine then ranks only the candidates — the corpus is
    never cross-joined against the query set.

    Scale shape: bucket rows are slim (id, band, key); the query bucket
    frame is tiny and broadcasts, so candidate generation is a map-side
    probe of the corpus bucket stream — no corpus shuffle. Vectors join
    back per candidate (hash join on id). `max_bucket_size` deterministically
    truncates a degenerate corpus bucket to its `max_bucket_size` smallest
    ids (bounding per-bucket candidate fan-out; at scale prefer MORE planes
    — finer buckets — over a tighter cap, which costs recall).

    Approximate by construction: a query's true neighbor in no shared
    bucket is missed (recall is pytest-bounded on clustered corpora); rows
    with fewer than k candidates return fewer than k neighbors.

    `probe_flips=1` enables MULTI-PROBE (Lv et al., VLDB'07): each query
    additionally probes every band key at Hamming distance 1 (one sign bit
    flipped — the buckets a borderline vector most likely fell into),
    trading ~(1 + bits/band)x more probe rows — still query-side only,
    still broadcast — for recall, WITHOUT re-hashing or touching the
    corpus-side bucket build. Deeper probing is deliberately not offered:
    past distance 1 the probe count grows combinatorially and raising
    n_planes is strictly better.
    """
    from kgx import dedup

    cb = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    qb = queries.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    # resolve dim ONCE (one driver probe on the corpus frame) so the two
    # bucket calls below don't each run their own blocking .first() job
    if planes is None and dim is None:
        dim = cb.select(F.size("vec").alias("d")).first()["d"]
    cbuck = dedup.hyperplane_band_buckets(
        cb, n_planes=n_planes, bands=bands, dim=dim, planes=planes
    )
    qbuck = dedup.hyperplane_band_buckets(
        qb, n_planes=n_planes, bands=bands, dim=dim, planes=planes
    )
    if probe_flips:
        if probe_flips != 1:
            raise ValueError("probe_flips supports 0 or 1 (raise n_planes instead)")
        rows_per_band = (len(planes) if planes is not None else n_planes) // bands
        # the exact key plus every Hamming-1 neighbor key (one char flipped)
        variants = [F.col("key")] + [
            F.concat(
                F.substring("key", 1, p),
                F.when(F.substring("key", p + 1, 1) == "0", F.lit("1")).otherwise(
                    F.lit("0")
                ),
                F.substring("key", p + 2, rows_per_band - p - 1),
            )
            for p in range(rows_per_band)
        ]
        qbuck = (
            qbuck.select("id", "band", F.explode(F.array(*variants)).alias("key"))
            .dropDuplicates(["id", "band", "key"])
        )
    if max_bucket_size is not None:
        wb = Window.partitionBy("band", "key").orderBy("id")
        cbuck = (
            cbuck.withColumn("_rn", F.row_number().over(wb))
            .filter(F.col("_rn") <= max_bucket_size)
            .drop("_rn")
        )
    cand = (
        cbuck.join(
            F.broadcast(qbuck.withColumnRenamed("id", "query_id")),
            ["band", "key"],
        )
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = (
        cand.join(
            F.broadcast(
                qb.select(F.col("id").alias("query_id"), F.col("vec").alias("qvec"))
            ),
            "query_id",
        )
        .join(
            cb.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("cvec")),
            "neighbor_id",
        )
        .withColumn(
            "sim",
            _dot(F.col("qvec"), F.col("cvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("cvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-codes scale path
# ---------------------------------------------------------------------------
#
# IVF prunes WHICH vectors get scored; PQ compresses WHAT is scored: each
# vector becomes m small codes (one byte each at k<=256), and query-time
# ADC (asymmetric distance computation) scores against the codes via a
# per-query m x k lookup table — the corpus' raw floats are never read at
# query time. At 100 TB of embeddings this is the difference between
# scanning 256 B/vector and scanning m bytes/vector. (Jegou et al. 2011,
# "Product Quantization for Nearest Neighbor Search".)
#
# Codebooks here are deterministic literals (the sandbox stand-in for
# trained sub-quantizers, same contract as ivf_topk's centroids) so a SQL
# oracle embeds the identical values; every fold is left-to-right in
# double, making codes, tables and ADC distances bit-exact cross-engine.


def _subvec(vec: Column, s: int, dsub: int) -> Column:
    # F.slice is 1-based; subspace s covers [s*dsub+1, (s+1)*dsub]
    return F.slice(vec, s * dsub + 1, dsub)


def _sqdist(a: Column, b: Column) -> Column:
    """Left-fold squared L2 distance (cross-engine deterministic)."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cb_literal(codebook_s: list[list[float]]) -> Column:
    """One subspace's codebook as a literal array<array<double>>."""
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in codebook_s]
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — per subspace, the nearest codebook entry
    (squared L2; ties break to the smaller code id via struct min). Narrow
    map over the corpus, no shuffle; emit is m ints per vector.

    The per-code candidates iterate via F.transform over the LITERAL
    codebook array rather than m*k unrolled aggregate expressions — the
    unrolled form produced a pathologically large expression tree
    (measured 7.7x slower end-to-end at m=8, k=16; codegen works on the
    loop form, chokes on the unrolled one)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])

    def code_for(s: int) -> Column:
        cb = _cb_literal(codebooks[s])
        sub = _subvec(F.col(vec_col), s, dsub)
        k = len(codebooks[s])
        return F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda c: F.struct(
                    _sqdist(sub, F.element_at(cb, c + F.lit(1))).alias("dist"),
                    c.cast("int").alias("code"),
                ),
            )
        )["code"]

    return df.select(
        F.col(id_col).alias("id"),
        F.array(*[code_for(s) for s in range(m)]).alias("codes"),
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: encode the corpus once, build each query's m x k distance
    table, score = in-row ordered fold over subspaces of table[s][code_s]
    (never a cross-row float sum — fold order is fixed so the oracle
    reproduces it bit-for-bit). Ranks ascend by distance, ties by
    neighbor id.

    Scale shape: corpus -> codes is a narrow map (m ints/vector); the
    query tables broadcast (|queries| * m * k doubles); scoring reads ONLY
    the code table. The raw corpus vectors are never touched at query
    time — that is the PQ contract."""
    assert codebooks is not None
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = pq_encode(corpus, codebooks, id_col, vec_col)

    # per-query lookup table: array over s of array over c of sqdist
    # (transform-loop form, same rationale as pq_encode)
    def qtab_for(s: int) -> Column:
        cb = _cb_literal(codebooks[s])
        sub = _subvec(F.col(vec_col), s, dsub)
        kk = len(codebooks[s])
        return F.transform(
            F.sequence(F.lit(0), F.lit(kk - 1)),
            lambda c: _sqdist(sub, F.element_at(cb, c + F.lit(1))),
        )

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.array(*[qtab_for(s) for s in range(m)]).alias("qtab"),
    )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("qtab"), s + F.lit(1)),
            F.element_at(F.col("codes"), s + F.lit(1)) + F.lit(1),
        ),
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("query_id"))
        .withColumn("adc_dist", adc)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col("id").alias("neighbor_id"), "adc_dist", "rank"
        )
    )
