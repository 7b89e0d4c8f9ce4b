"""End-to-end near-duplicate clustering: the composed scale pipeline.

``near_dup_clusters`` chains the individually-tested stages into the
shape a 100 TB training-data dedup actually runs:

  shingles → minhash signatures → LSH banding (equi-join candidates,
  never all-pairs) → exact Jaccard verification over full shingle sets
  → transitive closure (connected components) → one canonical id per
  near-dup group.

Every stage is a declarative DataFrame plan; the only quadratic is
per-LSH-bucket, and verification touches candidate pairs only.  The
canonical id is the group's minimum document id (deterministic,
partition-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from medtype_spark.dedup.minhash import (
    doc_shingles,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures_local,
)
from medtype_spark.operators.cc import connected_components


def near_dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.8,
) -> DataFrame:
    """(id, neardup_group, group_size): every document labeled with its
    near-duplicate group's canonical (minimum) id."""
    sh = doc_shingles(docs, text_col, id_col, n=n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # (r6) signatures row-locally (array_min over the doc's shingle
    # array — no explode/groupBy/exchange; bit-identical to the
    # exploded form, pytest-asserted).  ``sh`` stays persisted for the
    # Jaccard verification, its other consumer.
    sig = minhash_signatures_local(docs, text_col, id_col, n=n,
                                   num_hashes=num_hashes)
    cands = lsh_candidate_pairs(sig, id_col, bands=bands)
    verified = jaccard_pairs(sh, cands, id_col, min_jaccard=min_jaccard)

    comp = connected_components(
        verified.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        vertices=docs.select(F.col(id_col).alias("node")),
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("group_size"))
    out = comp.join(sizes, "component").select(
        F.col("node").alias(id_col),
        F.col("component").alias("neardup_group"),
        "group_size",
    )
    sh.unpersist()
    return out
