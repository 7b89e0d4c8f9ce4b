"""Approximate & exact nearest-neighbour search over embedding columns.

The Spark-native analogue of ScispaCy's alias-embedding kNN candidate
generator (entity_linkers.py:25-46).  Two strategies:

- ``brute_force_topk``: queries × corpus cosine ranking.  The query
  side is broadcast (queries are few); scoring is JVM-side zip_with /
  aggregate, ranking is a window per query.  Correct baseline and the
  within-block scorer.
- ``lsh_topk`` / ``lsh_cosine_pairs``: random-hyperplane LSH — bucket
  on sign bits of H seeded projections, candidate join within buckets,
  exact re-rank.  The scale path: candidates per query ∝ bucket size,
  not corpus size.

Plane components are md5-derived integers baked into the plan as
LITERAL arrays: zero per-row hashing at runtime (the dot against a
constant vector is pure whole-stage-codegen arithmetic), identical on
every executor, and reproducible by the DuckDB oracle (q61).

Skew guard (``lsh_cosine_pairs``): bucket population grows linearly
with the corpus at fixed n_planes, so within-bucket pair generation is
routed through ``operators.blocking.block_pairs`` — buckets beyond
``hot_threshold`` members are salted onto a 2-D cell grid exactly like
hot blocking keys, so no task ever materializes a whole bucket's
quadratic.  ``auto_planes`` additionally scales the bucket count with
the corpus (one cheap count() pre-pass).
"""

from __future__ import annotations

# Module-level so pandas_udf can resolve the stringified 'pd.Series'
# type hints produced by `from __future__ import annotations` (PySpark
# looks them up in the function's __globals__).
import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from medtype_spark.functions.scoring import md5_bucket
from medtype_spark.operators.pairs import cosine_sim, dot as dot_sim


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
    from medtype_spark.operators.pairs import l2_norm

    # (r6) Hoist the norms out of the per-pair expression: the corpus
    # norm is computed once per corpus row (not once per query×row) and
    # the query norm once per query row on the broadcast side.  The
    # denominator keeps the exact evaluation order of cosine_sim
    # (l2(query)*l2(corpus)), so every double is bit-identical — only
    # the per-pair work drops from 3 array reductions to 1.
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    joined = corpus.select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("_cn")
    ).join(F.broadcast(q))
    denom = F.col("_qn") * F.col("_cn")
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        dot_sim(F.col("_qvec"), F.col(vec_col)) / denom
    )
    scored = joined.where(F.col(id_col) != F.col("_qid")).select(
        F.col("_qid").alias("query_id"),
        F.col(id_col),
        cos.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "cosine")
    )


def plane_components(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic integer plane grid: component j of plane p =
    md5_bucket('seed:p:j', 1001) - 500 — computable in SQL, so LSH
    bucket assignment is engine-portable."""
    return [
        [float(md5_bucket(f"{seed}:{p}:{j}", 1001) - 500) for j in range(dim)]
        for p in range(n_planes)
    ]


def _hyperplane_bits(vec_col, dim: int, n_planes: int, seed: int = 42):
    """Sign-bit bucket key from pseudo-random hyperplanes.

    The planes are md5-derived constants baked into the plan as literal
    arrays (identical across executors and runs); the per-row work is
    one fused zip_with/aggregate dot per plane — no runtime hashing.
    """
    bits = []
    for comps in plane_components(dim, n_planes, seed):
        lit_plane = F.array(*[F.lit(c) for c in comps])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, c: x * c),
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
    hot_threshold: int = 5000,
    target_cell: int = 1000,
    auto_planes: bool = False,
    target_bucket: int = 2000,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at corpus scale: bucketed
    self-join (never all-pairs).

    Multi-table LSH: ``n_tables`` independent hyperplane sets, each an
    equi-join on its own bucket key; a pair is a candidate if ANY table
    collides (union + distinct), then exact cosine filters.  More
    tables = higher recall at linear candidate cost.  Returns
    (a, b, cosine) with a < b.

    Scale guards (fixed bucket counts are a hidden quadratic — bucket
    population is corpus/2^n_planes, so within-bucket pairs grow with
    the SQUARE of corpus size):

    - within-bucket pair generation goes through ``block_pairs`` with
      the (table, bucket) pair as the blocking key: buckets larger
      than ``hot_threshold`` are salted onto a 2-D cell grid (~
      ``target_cell``-member cells), so the shuffle key spreads a hot
      bucket across cells and no task sees a whole bucket — the exact
      mechanism (and property test) used for hot blocking keys;
    - ``auto_planes=True`` additionally derives n_planes from a
      count() pre-pass so the EXPECTED bucket size tracks
      ``target_bucket``: n_planes = max(n_planes,
      ceil(log2(n / target_bucket))).  Off by default so the bucket
      structure (and the q61 oracle) stays a pure function of the
      arguments.
    """
    import math

    from medtype_spark.operators.blocking import block_pairs

    if auto_planes:
        n = corpus.count()
        if n > target_bucket:
            n_planes = max(n_planes, math.ceil(math.log2(n / target_bucket)))

    per_table = []
    for t in range(n_tables):
        per_table.append(
            corpus.select(F.col(id_col), F.col(vec_col)).withColumn(
                "_bucket",
                F.concat(
                    F.lit(f"{t}:"),
                    _hyperplane_bits(F.col(vec_col), dim, n_planes, seed + 1000 * t),
                ),
            )
        )
    bucketed = per_table[0]
    for other in per_table[1:]:
        bucketed = bucketed.unionByName(other)

    pairs = block_pairs(
        bucketed,
        key_col="_bucket",
        id_col=id_col,
        hot_threshold=hot_threshold,
        target_cell=target_cell,
        extra_cols=[vec_col],
    )
    cands = pairs.select(
        F.col(f"a_{id_col}").alias("a"),
        F.col(f"b_{id_col}").alias("b"),
        F.col(f"a_{vec_col}").alias("_va"),
        F.col(f"b_{vec_col}").alias("_vb"),
    ).dropDuplicates(["a", "b"])
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


# ----------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probe lists — the
# second scale path next to hyperplane LSH.  The centroid model is
# dimension-sized (n_centroids × dim), so it trains driver-side on a
# deterministic sample and broadcasts; corpus assignment is one
# Arrow-batched argmax pass; a query touches only its nprobe nearest
# centroids' posting lists (candidates ∝ nprobe/n_centroids of the
# corpus, never all of it).
# ----------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 20000,
    iters: int = 10,
    seed: int = 42,
):
    """Lloyd k-means on a DETERMINISTIC driver-side sample.

    The sample is id-hash-stratified (not .sample(), whose row pick
    depends on partitioning), capped at ``sample_cap`` rows — the
    centroid model is the broadcast-sized "index", like the alias
    matrices.  Returns an (n_centroids, dim) numpy array, L2-normalized
    rows (cosine IVF = spherical k-means).
    """
    import numpy as np

    n = corpus.count()
    stride = max(1, n // sample_cap)
    sample = (
        corpus.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)
        .select(vec_col)
        .toPandas()
    )
    x = np.array([list(v) for v in sample[vec_col]], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x = x / norms

    rs = np.random.RandomState(seed)
    cents = x[rs.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cents.T
        assign = sims.argmax(1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.mean(0)
                nv = np.linalg.norm(v)
                cents[c] = v / nv if nv > 0 else cents[c]
    return cents


def md5_centroids(dim: int, n_centroids: int, seed: int = 7) -> "np.ndarray":
    """Deterministic integer centroid grid for the driver-checked IVF
    fixture: component j of centroid c = md5_bucket('ivf{seed}:c:j',
    1001) - 500 — the same engine-portable md5 recipe as the LSH
    hyperplanes, so the DuckDB oracle re-derives the coarse quantizer
    from scratch.  Integer-valued float64, so every dot product against
    integer-quantized vectors is EXACT regardless of summation order
    (sums stay far below 2^53) — argmax/rank decisions are therefore
    bit-portable across numpy, Spark, and DuckDB."""
    return np.array(
        [
            [float(md5_bucket(f"ivf{seed}:{c}:{j}", 1001) - 500) for j in range(dim)]
            for c in range(n_centroids)
        ],
        dtype=np.float64,
    )


def ivf_assign(
    corpus: DataFrame,
    centroids,
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
    metric: str = "cosine",
) -> DataFrame:
    """Nearest-centroid cell id per row (Arrow-batched argmax against
    the broadcast centroid matrix).  ``metric='cosine'`` L2-normalizes
    rows first (spherical k-means); ``metric='dot'`` ranks by raw inner
    product (IP-IVF, the FAISS IndexIVFFlat/IP analogue) — with
    integer-valued inputs the argmax is exact and engine-portable."""
    spark = corpus.sparkSession
    cb = spark.sparkContext.broadcast(np.asarray(centroids))
    normalize = metric == "cosine"

    @pandas_udf(IntegerType())
    def cell(vecs: pd.Series) -> pd.Series:
        cents = cb.value
        x = np.array([list(v) for v in vecs], dtype=np.float64)
        if normalize:
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            x = x / norms
        return pd.Series((x @ cents.T).argmax(1).astype("int32"))

    return corpus.withColumn(out_col, cell(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 64,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids=None,
    seed: int = 42,
    metric: str = "cosine",
) -> DataFrame:
    """Approximate top-k via IVF probe lists: assign the corpus once,
    probe each query's ``nprobe`` nearest cells, exact re-rank within
    the probed candidates.  Recall rises with nprobe at linear
    candidate cost (the IVF knob); rank semantics match
    brute_force_topk within the candidate set.  ``metric='dot'`` skips
    normalization and ranks by raw inner product (exact on
    integer-valued vectors — the driver-checked fixture path); score
    column is named after the metric."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, dim, n_centroids, id_col, vec_col, seed=seed
        )
    assigned = ivf_assign(corpus, centroids, vec_col, metric=metric)

    spark = corpus.sparkSession
    cb = spark.sparkContext.broadcast(np.asarray(centroids))
    np_probe = min(nprobe, len(centroids))
    normalize = metric == "cosine"

    @pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        cents = cb.value
        x = np.array([list(v) for v in vecs], dtype=np.float64)
        if normalize:
            norms = np.linalg.norm(x, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            x = x / norms
        sims = x @ cents.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :np_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    score_col = "cosine" if normalize else "dot"
    score_fn = cosine_sim if normalize else dot_sim
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    ).withColumn("_cell", F.explode(probes(F.col("_qvec"))))
    joined = assigned.join(
        F.broadcast(q), assigned["ivf_cell"] == q["_cell"]
    ).where(F.col(id_col) != F.col("_qid"))
    scored = joined.select(
        F.col("_qid").alias("query_id"),
        F.col(id_col),
        score_fn(F.col("_qvec"), F.col(vec_col)).alias(score_col),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc(score_col), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, score_col)
    )


# --- IVF-PQ: product-quantized ADC re-rank ------------------------------

def md5_pq_codebooks(
    dim: int = 64, m: int = 8, k: int = 16, seed: int = 7
) -> np.ndarray:
    """Deterministic integer PQ codebooks, shape (m, k, dim//m).

    Component t of codeword c in subspace j =
    ``md5_bucket('pq{seed}:{j}:{c}:{t}', 2001) - 1000`` — the same
    engine-portable md5 recipe as the IVF centroid grid, so the DuckDB
    oracle re-derives every codeword from scratch.  Integer-valued
    float64: squared-distance sums stay far below 2^53, making encode
    argmins and ADC rankings bit-portable across numpy, Spark, and
    DuckDB."""
    d = dim // m
    return np.array(
        [
            [
                [float(md5_bucket(f"pq{seed}:{j}:{c}:{t}", 2001) - 1000) for t in range(d)]
                for c in range(k)
            ]
            for j in range(m)
        ],
        dtype=np.float64,
    )


def pq_encode(
    corpus: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Product-quantization codes: per subspace j, the index of the
    L2-nearest codeword (Arrow-batched argmin against the broadcast
    codebook tensor; ties break to the LOWEST codeword index —
    np.argmin's first-minimum, mirrored by the oracle's
    ``ORDER BY dist, c`` rank).  Output column is ``array<int>`` of
    length m — the 100 TB shape: m bytes of code per vector replace
    dim floats in the candidate store."""
    spark = corpus.sparkSession
    cb = spark.sparkContext.broadcast(np.asarray(codebooks))

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        books = cb.value  # (m, k, d)
        m_sub, _k, d = books.shape
        x = np.array([list(v) for v in vecs], dtype=np.float64)
        codes = np.empty((len(x), m_sub), dtype=np.int32)
        for j in range(m_sub):
            sub = x[:, j * d : (j + 1) * d]                    # (N, d)
            # (N, k): ||sub - C_jc||^2 for every codeword
            dists = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(dists, axis=1)             # first min
        return pd.Series([row.tolist() for row in codes])

    return corpus.withColumn(out_col, encode(F.col(vec_col)))


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int = 64,
    k: int = 3,
    nprobe: int = 2,
    m: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    centroids=None,
    codebooks=None,
    n_centroids: int = 16,
    seed: int = 7,
) -> DataFrame:
    """IVF-PQ approximate top-k — the standard 100 TB ANN shape.

    Two-level quantization: the IVF coarse quantizer restricts each
    query to its ``nprobe`` probed cells (candidates ∝
    nprobe/n_centroids of the corpus, exactly as in :func:`ivf_topk`),
    and within the candidates the exact re-rank is replaced by
    **asymmetric distance computation**: each candidate is represented
    only by its m-subspace PQ code, and its distance to the query is
    the sum of m precomputed lookup-table entries
    ``LUT[j][code_j] = ||q_j - C_j,code_j||²`` — O(m) adds per
    candidate instead of O(dim) multiplies, with the LUT built once
    per query against the broadcast codebooks.

    The ADC sum itself runs JVM-side in whole-stage codegen:
    ``aggregate(transform(code, (c, j) -> lut[j*k + c]))`` over the
    query's flattened LUT array — no Python in the per-candidate hot
    path.  With integer-valued codebooks and quantized vectors every
    LUT entry and every ADC sum is an exact integer, so rankings are
    bit-portable (ties break on ascending ``vec_id``).

    Returns (query_id, rank, vec_id, adc) with rank 1..k by ascending
    ADC distance.
    """
    if centroids is None:
        centroids = md5_centroids(dim, n_centroids, seed=seed)
    if codebooks is None:
        codebooks = md5_pq_codebooks(dim, m, k_codes, seed=seed)
    assigned = pq_encode(
        ivf_assign(corpus, centroids, vec_col, metric="dot"),
        codebooks,
        vec_col,
    )

    spark = corpus.sparkSession
    cents_b = spark.sparkContext.broadcast(np.asarray(centroids))
    books_b = spark.sparkContext.broadcast(np.asarray(codebooks))
    np_probe = min(nprobe, len(centroids))

    @pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        cents = cents_b.value
        x = np.array([list(v) for v in vecs], dtype=np.float64)
        sims = x @ cents.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :np_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    from pyspark.sql.types import DoubleType

    @pandas_udf(ArrayType(DoubleType()))
    def adc_lut(vecs: pd.Series) -> pd.Series:
        books = books_b.value  # (m, k, d)
        m_sub, kk, d = books.shape
        x = np.array([list(v) for v in vecs], dtype=np.float64)
        out = np.empty((len(x), m_sub * kk), dtype=np.float64)
        for j in range(m_sub):
            sub = x[:, j * d : (j + 1) * d]
            out[:, j * kk : (j + 1) * kk] = (
                (sub[:, None, :] - books[j][None, :, :]) ** 2
            ).sum(axis=2)
        return pd.Series([row.tolist() for row in out])

    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qvec"),
    ).select(
        "_qid",
        F.explode(probes(F.col("_qvec"))).alias("_cell"),
        adc_lut(F.col("_qvec")).alias("_lut"),
    )
    joined = assigned.join(
        F.broadcast(q), assigned["ivf_cell"] == q["_cell"]
    ).where(F.col(id_col) != F.col("_qid"))
    # ADC: sum of m LUT lookups, pure whole-stage-codegen arithmetic.
    # The transform lambda's SECOND parameter is the element index —
    # the one place that pyspark signature is exactly what we want.
    adc = F.aggregate(
        F.transform(
            F.col("pq_code"),
            lambda c, j: F.element_at(F.col("_lut"), j * k_codes + c + 1),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = joined.select(
        F.col("_qid").alias("query_id"), F.col(id_col), adc.alias("adc")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "adc")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = 20000,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace Lloyd k-means on the same deterministic id-hash-
    stratified driver sample as :func:`train_ivf_centroids` — the
    production PQ path (the md5 codebooks are the oracle fixture).
    Returns (m, k, dim//m)."""
    n = corpus.count()
    stride = max(1, n // sample_cap)
    sample = (
        corpus.where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)
        .select(vec_col)
        .toPandas()
    )
    x = np.array([list(v) for v in sample[vec_col]], dtype=np.float64)
    d = dim // m
    rs = np.random.RandomState(seed)
    books = np.empty((m, k, d), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * d : (j + 1) * d]
        cents = sub[rs.choice(len(sub), size=min(k, len(sub)), replace=False)]
        for _ in range(iters):
            dists = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = dists.argmin(1)
            for c in range(len(cents)):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(0)
        if len(cents) < k:  # degenerate tiny sample: pad by repetition
            cents = np.vstack([cents] * (k // len(cents) + 1))[:k]
        books[j] = cents
    return books
