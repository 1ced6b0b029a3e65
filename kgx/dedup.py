"""Deduplication operators for training-data pipelines, Spark-first.

All variants follow the same shape: derive a *blocking key* that is cheap
and shuffle-friendly, join/group only within blocks, and verify candidates
with an exact measure. At 100 TB the blocking step is the whole game — the
pairwise step must never see the full cross product.

  * exact_dedup           — md5(normalized text) groupBy; one shuffle on a
                            short hash key (never on the text itself)
  * ngram_jaccard_pairs   — n-token shingles → inverted index → candidate
                            pairs sharing a shingle → exact Jaccard filter
  * minhash_lsh_pairs     — MinHash signatures (k permutations, JVM-side
                            xxhash64) → banded LSH buckets → candidates →
                            exact Jaccard verify
  * simhash               — 64-bit SimHash fingerprint + banded candidates
  * embedding_neardup     — cosine near-duplicates over an embedding column
                            via random-hyperplane LSH buckets

Everything is DataFrame expressions (codegen); no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from kgx.textops import tokens

_P = 2147483647  # 2^31 - 1, Mersenne prime: (a*h+b) stays < 2^62 (no ANSI overflow)


def _norm_text(c: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) docs; keeper = min id.
    Returns (keep_id, dup_id) rows for dup_id != keep_id."""
    h = df.select(F.col(id_col), F.md5(_norm_text(F.col(text_col))).alias("h"))
    groups = h.groupBy("h").agg(
        F.min(id_col).alias("keep_id"), F.collect_list(id_col).alias("ids")
    )
    return (
        groups.select("keep_id", F.explode("ids").alias("dup_id"))
        .filter(F.col("dup_id") != F.col("keep_id"))
    )


def shingles_from_tokens(toks: Column, n: int = 5) -> Column:
    """n-token shingles as array<string> (distinct), from a token array.

    IMPORTANT: `toks` must reference an already-projected column (e.g.
    `F.col("toks")`), never an inline `split(...)` expression — expressions
    referenced inside the transform lambda are re-evaluated once per shingle
    position, turning tokenization O(len) into O(len^2) (measured 8x on the
    sf0.1 corpus)."""
    k = F.size(toks) - F.lit(n - 1)
    return F.when(
        k > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def shingles(c: Column, n: int = 5) -> Column:
    """n-token shingles of lowercase text (convenience; see the note on
    shingles_from_tokens — prefer projecting tokens first in hot paths)."""
    return shingles_from_tokens(tokens(F.lower(c)), n)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b) with sim >= threshold.

    Inverted-index blocking: only pairs sharing >=1 shingle are scored —
    |pairs| is bounded by shingle collision, not |docs|^2. Hot shingles
    (boilerplate) should be dropped upstream via a document-frequency cap
    at very large scale.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("toks"))
        .select("id", shingles_from_tokens(F.col("toks"), n).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    )
    # persist the inverted index: without a barrier Catalyst inlines the
    # tokenize+shingle expression tree into BOTH sides of the self-join
    # (26 split() occurrences in the physical plan; 3x wall time measured).
    # MEMORY_AND_DISK, ~one row per (doc, distinct shingle) — the same
    # footprint the join shuffle moves anyway.
    inv = sh.select("id", "n_sh", F.explode("sh").alias("s")).persist()
    a, b = inv.alias("a"), inv.alias("b")
    # Size-ratio prefilter (exact): J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so
    # J >= t requires t*|B| <= |A| and t*|A| <= |B|. Prunes candidate rows
    # at the join before the per-pair aggregation ever sees them.
    t = F.lit(float(threshold))
    inter = (
        a.join(
            b,
            on=[
                F.col("a.s") == F.col("b.s"),
                F.col("a.id") < F.col("b.id"),
                F.col("a.n_sh") >= t * F.col("b.n_sh"),
                F.col("b.n_sh") >= t * F.col("a.n_sh"),
            ],
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -- MinHash + LSH ----------------------------------------------------------

# deterministic affine coefficients (a_j, b_j) for k permutations
def _coeffs(k: int) -> list[tuple[int, int]]:
    out = []
    a, b = 0x9E3779B9, 0xC2B2AE3D
    for j in range(k):
        a = (a * 1103515245 + 12345) % _P
        b = (b * 1103515245 + 12345) % _P
        out.append((a | 1, b))
    return out


def minhash_signature(c: Column, n: int = 5, k: int = 32) -> Column:
    """array<long> of k min-hash values over the shingle set. JVM-side:
    xxhash64 per shingle + affine rehash per permutation."""
    return minhash_from_shingles(shingles(c, n), k)


def minhash_from_shingles(sh: Column, k: int = 32) -> Column:
    # reduce the 64-bit shingle hash mod P first so a*h+b never overflows
    # a signed long under ANSI arithmetic (a, h < 2^31 → product < 2^62)
    hashes = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_P)))
    sig = [
        F.array_min(
            F.transform(hashes, lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_P)))
        )
        for (a, b) in _coeffs(k)
    ]
    return F.array(*sig)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    k: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Banded-LSH candidate generation + exact Jaccard verification.

    bands=8, rows=4 over k=32 → collision prob s^4 per band; docs with
    Jaccard s=0.8 collide in >=1 band w.p. ~0.97. The *only* shuffle on
    document pairs is within LSH buckets.
    """
    rows = k // bands
    spark = df.sparkSession
    npart = spark.sparkContext.defaultParallelism

    # CPU-heavy signature computation: spread across cores regardless of
    # input file layout (a single parquet file would otherwise pin this to
    # one task)
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("toks")
    ).repartition(npart, "id")
    sh = base.select("id", shingles_from_tokens(F.col("toks"), n).alias("sh")).persist()
    sig = sh.select("id", minhash_from_shingles(F.col("sh"), k).alias("sig"))

    # bucket rows carry only (id, band, key) — the shingle arrays never
    # enter the candidate-pair shuffle
    band_cols = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.xxhash64(
                    F.lit(bi), *[F.col("sig")[bi * rows + r] for r in range(rows)]
                ).alias("key"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(band_cols).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )

    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


# -- SimHash ----------------------------------------------------------------

def _simhash_from_counters(counters: list[Column]) -> Column:
    """Assemble the 64-bit fingerprint from per-bit counters: bit i set iff
    counter_i > 0 (sign of the sum)."""
    from functools import reduce

    bit_terms = [
        F.when(
            counters[i] > 0,
            F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(64)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), bit_terms)


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """64-bit SimHash per doc: bit i of the fingerprint is the sign of
    sum over n-token shingles of (2*bit_i(xxhash64(shingle)) - 1).

    Implemented as explode -> hash -> groupBy(id) with 64 flat SUM columns:
    plain aggregates stay inside whole-stage codegen, where the equivalent
    higher-order-function formulation (aggregate+zip_with over a 64-array
    per shingle) runs interpreted (~20x slower measured at sf0.1)."""
    sh = (
        df.select(F.col(id_col).alias("id"), tokens(F.lower(F.col(text_col))).alias("toks"))
        .select("id", shingles_from_tokens(F.col("toks"), n).alias("sh"))
    )
    hashed = sh.select("id", F.explode("sh").alias("s")).select(
        "id", F.xxhash64("s").alias("h")
    )
    sums = [
        F.sum(
            F.shiftright("h", i).bitwiseAND(F.lit(1)).cast("int") * 2 - 1
        ).alias(f"c{i}")
        for i in range(64)
    ]
    counters = hashed.groupBy("id").agg(*sums)
    return counters.select(
        F.col("id").alias(id_col),
        _simhash_from_counters([F.col(f"c{i}") for i in range(64)]).alias("simhash"),
    )


def simhash_candidates(fp: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs: equal 16-bit chunk in any of 4 bands
    (catches all pairs with Hamming distance <= 3)."""
    # barrier: fp usually carries the (expensive) fingerprint expression;
    # without persist the self-join below inlines it into both sides
    fp = fp.persist()
    chunks = fp.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk"))
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


# -- embedding near-dup -----------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    bands: int = 4,
    threshold: float = 0.35,
) -> DataFrame:
    """Cosine near-duplicates via banded random-hyperplane LSH.

    Signature = sign pattern of <v, r_j> for deterministic pseudo-random ±1
    planes r_j; the signature is split into `bands` buckets (OR-amplified:
    a pair is a candidate if ANY band matches — collision prob per band
    (1−θ/π)^(planes/bands)). Exact cosine verifies candidates. Tune
    (n_planes, bands, threshold) to the corpus similarity profile; defaults
    suit loosely-clustered corpora, raise threshold to 0.9+ for true dups.
    """
    dim = df.select(F.size(vec_col).alias("d")).first()["d"]
    rows = n_planes // bands

    def plane(j: int) -> Column:
        # deterministic pseudo-random plane: component i = hash(j, i) mapped to ±1
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (F.pmod(F.xxhash64(F.lit(j), i), F.lit(2)) * 2 - 1).cast("double"),
        )

    v = F.col(vec_col)
    sig_bits = [
        F.when(
            F.aggregate(
                F.zip_with(v, plane(j), lambda x, p: x.cast("double") * p),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for j in range(n_planes)
    ]
    band_keys = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    "", *[sig_bits[bi * rows + r].cast("string") for r in range(rows)]
                ).alias("key"),
            )
            for bi in range(bands)
        ]
    )
    keyed = df.select(
        F.col(id_col).alias("id"), v.alias("vec"), F.explode(band_keys).alias("bk")
    ).select("id", "vec", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a, b = keyed.alias("a"), keyed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.vec"), F.col("b.vec"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(f"{side}.vec"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.key") == F.col("b.key"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with(
                    F.col("vec_a"),
                    F.col("vec_b"),
                    lambda x, y: x.cast("double") * y.cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / (
                F.sqrt(
                    F.aggregate(
                        F.transform(F.col("vec_a"), lambda x: x.cast("double") * x.cast("double")),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                )
                * F.sqrt(
                    F.aggregate(
                        F.transform(F.col("vec_b"), lambda x: x.cast("double") * x.cast("double")),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                )
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
