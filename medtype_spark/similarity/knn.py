"""Approximate & exact nearest-neighbour search over embedding columns.

The Spark-native analogue of ScispaCy's alias-embedding kNN candidate
generator (entity_linkers.py:25-46).  Two strategies:

- ``brute_force_topk``: queries × corpus cosine ranking.  The query
  side is broadcast (queries are few); scoring is JVM-side zip_with /
  aggregate, ranking is a window per query.  Correct baseline and the
  within-block scorer.
- ``lsh_topk``: random-hyperplane LSH — bucket on sign bits of H
  seeded projections (computed JVM-side from xxhash64-derived
  pseudo-random plane components), candidate join within buckets,
  exact re-rank.  The scale path: candidates per query ∝ bucket size,
  not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from medtype_spark.operators.pairs import cosine_sim


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Returns (query_id, rank, vec_id, cosine).  Ties broken by vec_id
    (deterministic).  Excludes self-matches when ids coincide.
    """
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    )
    joined = corpus.select(id_col, vec_col).join(F.broadcast(q))
    scored = joined.where(F.col(id_col) != F.col("_qid")).select(
        F.col("_qid").alias("query_id"),
        F.col(id_col),
        cosine_sim(F.col("_qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )


def _hyperplane_bits(vec_col, dim: int, n_planes: int, seed: int = 42):
    """Sign-bit bucket key from pseudo-random hyperplanes, JVM-side.

    Plane p component j = (xxhash64(seed, p, j) % 1001 - 500) — a fixed
    deterministic pseudo-gaussian-ish integer grid, identical across
    executors and runs.
    """
    bits = []
    for p in range(n_planes):
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), j), F.lit(1001)) - 500
            ).cast("double"),
        )
        dot = F.aggregate(
            F.zip_with(vec_col, comps, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_cosine_pairs(
    corpus: DataFrame,
    dim: int,
    min_cosine: float = 0.8,
    n_planes: int = 8,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at corpus scale: bucketed
    self-join (never all-pairs).

    Multi-table LSH: ``n_tables`` independent hyperplane sets, each an
    equi-join on its own bucket key; a pair is a candidate if ANY table
    collides (union + distinct), then exact cosine filters.  More
    tables = higher recall at linear candidate cost — the standard
    recall knob the single-table q51 lacked.  Returns (a, b, cosine)
    with a < b.
    """
    per_table = []
    for t in range(n_tables):
        bucketed = corpus.select(
            F.col(id_col), F.col(vec_col)
        ).withColumn(
            "_bucket",
            _hyperplane_bits(F.col(vec_col), dim, n_planes, seed + 1000 * t),
        )
        a = bucketed.select(
            F.col(id_col).alias("a"), F.col(vec_col).alias("_va"), "_bucket"
        )
        b = bucketed.select(
            F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"), "_bucket"
        )
        per_table.append(
            a.join(b, "_bucket").where(F.col("a") < F.col("b")).select("a", "b", "_va", "_vb")
        )
    cands = per_table[0]
    for other in per_table[1:]:
        cands = cands.unionByName(other)
    cands = cands.dropDuplicates(["a", "b"])
    return cands.select(
        "a", "b", cosine_sim(F.col("_va"), F.col("_vb")).alias("cosine")
    ).where(F.col("cosine") >= min_cosine)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket join on hyperplane sign bits, exact
    re-rank within buckets.  Recall < 1 by design; rank semantics match
    brute_force_topk within the candidate set."""
    c = corpus.withColumn("_bucket", _hyperplane_bits(F.col(vec_col), dim, n_planes, seed))
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    ).withColumn("_bucket", _hyperplane_bits(F.col("_qvec"), dim, n_planes, seed))
    joined = c.join(F.broadcast(q), "_bucket").where(F.col(id_col) != F.col("_qid"))
    scored = joined.select(
        F.col("_qid").alias("query_id"),
        F.col(id_col),
        cosine_sim(F.col("_qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )
