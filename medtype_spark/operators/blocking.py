"""Blocking-key generation and skew-aware within-block pair generation.

The analogue of the reference's candidate generation: QuickUMLS blocks
the UMLS lexicon by n-gram similarity before scoring
(medtype-as-service/server/medtype_serving/server/entity_linkers.py:50-70),
and the serving layer routes hot traffic specially
(.../server/__init__.py:128-131, 204-207).  At 10^12-doc scale a hot
blocking key (a common surface form like "apple") turns the within-block
self-join into a single-reducer quadratic bomb, so:

1. a cheap pre-pass counts block sizes (one groupBy);
2. keys whose count exceeds ``hot_threshold`` are *salted*: members get
   a deterministic salt in [0, s) with s = ceil(count / target);
3. pairs = within-salt-cell pairs + cross-cell pairs enumerated over the
   (i < j) cell grid — every unordered intra-block pair is produced
   EXACTLY once (completeness is property-tested with a planted hot
   key in tests/test_blocking.py).

Everything is built-in DataFrame ops — the joins shuffle on
(key, salt) so no single task ever sees a whole hot block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from medtype_spark.functions.text import clean_text_udf


def blocking_key(col):
    """Normalized-surface-form blocking key: lower, trim, collapse
    whitespace, strip non-alnum.  (Type-filtered refinement is applied
    separately by the J8 type filter — see operators/typefilter.py.)"""
    out = F.lower(F.trim(col))
    out = F.regexp_replace(out, r"[^a-z0-9 ]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return out


def with_blocking_key(mentions: DataFrame, mention_col: str = "mention",
                      out_col: str = "block_key") -> DataFrame:
    cleaned = clean_text_udf(F.col(mention_col))
    return mentions.withColumn(out_col, blocking_key(cleaned))


def block_pairs(
    df: DataFrame,
    key_col: str = "block_key",
    id_col: str = "mention_key",
    hot_threshold: int = 10000,
    target_cell: int = 2000,
    max_block: int | None = None,
    extra_cols: list[str] | None = None,
    persist_registry: list | None = None,
) -> DataFrame:
    """All unordered within-block pairs, salted for hot keys.

    Returns DataFrame(key_col, a_<id>, b_<id> [, a_/b_ extra cols]) with
    ``a < b`` canonical order.  Blocks larger than ``max_block`` (if
    set) are dropped entirely (the reference analogously refuses
    unbounded candidate lists — QuickUMLS thresholds at 0.6 similarity).
    """
    extra_cols = extra_cols or []
    cols = [key_col, id_col, *extra_cols]
    reserved = {"_cell", "_ncells", "_bsize"}
    clash = reserved.intersection(cols)
    if clash:
        # the salt grid overwrites these internally; a caller key named
        # "_cell" silently degrades the block join to all-pairs
        raise ValueError(f"block_pairs reserved column name(s) in input: {clash}")
    # The salted table is consumed three times (size pre-pass + both
    # join sides); persist it so upstream stages (UDF scans, joins) run
    # once.  MEMORY_AND_DISK: spills instead of OOM at scale.
    base = df.select(*cols).persist(StorageLevel.MEMORY_AND_DISK)
    if persist_registry is not None:
        persist_registry.append(base)

    counts = base.groupBy(key_col).agg(F.count(F.lit(1)).alias("_bsize"))
    if max_block is not None:
        counts = counts.where(F.col("_bsize") <= max_block)
    counts = counts.withColumn(
        "_ncells",
        F.when(F.col("_bsize") > hot_threshold,
               F.ceil(F.col("_bsize") / F.lit(target_cell)).cast("int"))
        .otherwise(F.lit(1)),
    )

    salted = base.join(counts, key_col).withColumn(
        "_cell", F.pmod(F.xxhash64(F.col(id_col)), F.col("_ncells")).cast("int")
    )

    def side(prefix: str) -> DataFrame:
        renames = [F.col(key_col)] + [
            F.col(c).alias(f"{prefix}_{c}") for c in [id_col, *extra_cols]
        ] + [F.col("_cell").alias(f"{prefix}_cell"),
             F.col("_ncells").alias(f"{prefix}_ncells")]
        return salted.select(*renames)

    a, b = side("a"), side("b")

    # Same-cell pairs: canonical id order within the cell.  Shuffle key
    # is (key, cell) — a hot block spreads over its s cells.
    same = a.join(
        b.drop("b_ncells"),
        on=[a[key_col] == b[key_col], F.col("a_cell") == F.col("b_cell"),
            F.col(f"a_{id_col}") < F.col(f"b_{id_col}")],
    ).drop(b[key_col]).drop("a_ncells")
    # Cross-cell pairs via 2D grid replication: grid cell (i, j), i<j,
    # receives replicas of cell i (as the a side) and cell j (as the b
    # side), so the JOIN KEY is (key, i, j) — ~s²/2 keys of ~target²
    # pairs each.  The previous scheme equi-joined on the bare key with
    # a_cell < b_cell as a post-filter, which put a hot block's entire
    # (1 - 1/s) cross-cell quadratic inside ONE join partition — the
    # single-reducer bomb the salt exists to kill.  Replication factor
    # per row is (s - 1), i.e. shuffle volume stays proportional to the
    # pair output; cold blocks (s = 1) replicate nothing.
    a_rep = (
        a.where(F.col("a_cell") < F.col("a_ncells") - 1)
        .withColumn(
            "_gj",
            F.explode(F.sequence(F.col("a_cell") + 1, F.col("a_ncells") - 1)),
        )
        .withColumnRenamed("a_cell", "_gi")
        .drop("a_ncells")
    )
    b_rep = (
        b.where(F.col("b_cell") > 0)
        .withColumn("_gi", F.explode(F.sequence(F.lit(0), F.col("b_cell") - 1)))
        .withColumnRenamed("b_cell", "_gj")
        .drop("b_ncells")
    )
    cross = a_rep.join(b_rep, on=[a_rep[key_col] == b_rep[key_col],
                                  a_rep["_gi"] == b_rep["_gi"],
                                  a_rep["_gj"] == b_rep["_gj"]]).drop(
        b_rep[key_col]
    ).drop(b_rep["_gi"]).drop(b_rep["_gj"])

    out_cols = [key_col] + [f"a_{c}" for c in [id_col, *extra_cols]] + [
        f"b_{c}" for c in [id_col, *extra_cols]
    ]
    same_part = same.select(*out_cols)

    # For cross-cell pairs enforce a<b by swapping where needed.
    swap_needed = F.col(f"a_{id_col}") > F.col(f"b_{id_col}")
    swapped_cols = [F.col(key_col)]
    for c in [id_col, *extra_cols]:
        swapped_cols.append(
            F.when(swap_needed, F.col(f"b_{c}")).otherwise(F.col(f"a_{c}")).alias(f"a_{c}")
        )
    for c in [id_col, *extra_cols]:
        swapped_cols.append(
            F.when(swap_needed, F.col(f"a_{c}")).otherwise(F.col(f"b_{c}")).alias(f"b_{c}")
        )
    cross_part = cross.select(*swapped_cols).select(*out_cols)

    return same_part.union(cross_part)
