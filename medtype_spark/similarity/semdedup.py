"""SemDedup: semantic (embedding-level) deduplication.

Web-scale motivation: SemDedup (Abbas et al. 2023, arXiv:2303.09540)
showed that pruning SEMANTIC near-duplicates — pairs whose embeddings
are nearly parallel even when their surface text differs — shrinks
web-scale training corpora with no quality loss.  The published
recipe is exactly a composition this engine already ships: k-means
cluster the embeddings, compare pairs ONLY within a cluster, keep one
representative per near-duplicate group.

Spark-first plan (no all-pairs join anywhere):

* coarse assignment: one Arrow-batched argmax against the broadcast
  centroid matrix (`similarity/knn.py:ivf_assign`) — the same coarse
  quantizer the IVF/IVF-PQ ANN index uses, so the cluster model is
  shared infrastructure, not a second training job;
* within-cell pairs through the salted 2-D grid
  (`operators/blocking.py:block_pairs` with the embedding carried as
  an extra column): quadratic work is bounded per CELL (≈ corpus /
  n_centroids on average; hot cells split into ≤ target_cell² tiles),
  never per corpus;
* JVM-side cosine (`operators/pairs.py:cosine_sim` — zip_with +
  aggregate, no Python) filters edges at ``threshold``;
* connected components (`operators/cc.py`) close the near-dup
  relation transitively; canonical id = min id per component — the
  same keep-rule as exact dedup, so downstream code treats both
  dedups uniformly.

Cross-cell misses are inherent to SemDedup (the paper accepts them:
a near-dup pair split across cluster boundaries is not compared).
Recall against brute-force cosine is therefore a measured property of
the centroid model, not of this operator — see the pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medtype_spark.operators.blocking import block_pairs
from medtype_spark.operators.cc import connected_components
from medtype_spark.operators.pairs import cosine_sim, dot
from medtype_spark.similarity.knn import ivf_assign


def semantic_dedup(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    metric: str = "cosine",
    hot_threshold: int = 10000,
    target_cell: int = 2000,
    small_graph_threshold: int | None = 100_000,
) -> DataFrame:
    """Returns DataFrame(id, cell, canonical_id, group_size,
    is_canonical): every input row labeled with its semantic-duplicate
    group.  Rows with ``is_canonical`` form the deduplicated corpus.
    """
    # key column must NOT be named "_cell": block_pairs uses that name
    # internally for its salt-grid cell and would overwrite the key
    assigned = ivf_assign(corpus, centroids, vec_col=vec_col,
                          out_col="sd_cell", metric=metric)

    pairs = block_pairs(
        assigned.select(F.col("sd_cell"), F.col(id_col), F.col(vec_col)),
        key_col="sd_cell",
        id_col=id_col,
        hot_threshold=hot_threshold,
        target_cell=target_cell,
        extra_cols=[vec_col],
    )
    score = (
        cosine_sim(F.col(f"a_{vec_col}"), F.col(f"b_{vec_col}"))
        if metric == "cosine"
        else dot(F.col(f"a_{vec_col}"), F.col(f"b_{vec_col}"))
    )
    edges = pairs.where(score >= F.lit(threshold)).select(
        F.col(f"a_{id_col}").alias("src"), F.col(f"b_{id_col}").alias("dst")
    )

    labels = connected_components(
        edges,
        vertices=assigned.select(F.col(id_col).alias("node")),
        small_graph_threshold=small_graph_threshold,
    )
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    return (
        assigned.select(F.col(id_col), F.col("sd_cell").alias("cell"))
        .join(labels.withColumnRenamed("node", id_col), id_col)
        .join(sizes, "component")
        .select(
            id_col,
            "cell",
            F.col("component").alias("canonical_id"),
            "group_size",
            (F.col("component") == F.col(id_col)).alias("is_canonical"),
        )
    )
