"""Ranked-selection operators (the reference's positional patterns).

W1: top-1 candidate per mention — ``cands[0]`` after best-first sort
    (eval_models.py:59; annotation.py:80-84, parse-time sort :108).
W2: first candidate satisfying a predicate, else fall back to rank-0 —
    the ``filter_on_cat`` oracle join (eval_models.py:3-13).
W3: is_first mention of an entity in document order (start, -end)
    (document.py:64-70, order key document.py:23).

All are window functions — per-key partial ordering, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_candidate(
    mentions: DataFrame,
    cand_col: str = "candidates",
    out_col: str = "top_candidate",
) -> DataFrame:
    """W1: element 0 of the best-first candidate list (array-local —
    no shuffle at all)."""
    return mentions.withColumn(
        out_col,
        F.when(F.size(cand_col) > 0, F.col(cand_col)[0]),
    )


def first_satisfying(
    mentions: DataFrame,
    predicate,
    cand_col: str = "candidates",
    out_col: str = "selected",
) -> DataFrame:
    """W2: first candidate (in rank order) satisfying ``predicate``
    (element-level lambda), else candidate 0
    (eval_models.py:3-13 fallback semantics)."""
    filtered = F.filter(F.col(cand_col), predicate)
    return mentions.withColumn(
        out_col,
        F.when(F.size(filtered) > 0, filtered[0]).otherwise(
            F.when(F.size(cand_col) > 0, F.col(cand_col)[0])
        ),
    )


def mark_first_mention(
    annotations: DataFrame,
    doc_col: str = "docid",
    eid_col: str = "eid",
    start_col: str = "start",
    end_col: str = "end",
    out_col: str = "is_first",
) -> DataFrame:
    """W3: first mention of each entity per doc, order (start, -end)."""
    w = Window.partitionBy(doc_col, eid_col).orderBy(
        F.asc(start_col), F.desc(end_col)
    )
    return annotations.withColumn(out_col, F.row_number().over(w) == 1)


def topk_by(df: DataFrame, order: list[Column], k: int,
            partition_by: list[str] | None = None) -> DataFrame:
    """Generic top-k: windowed when partitioned, global sort+limit
    otherwise (Spark's TakeOrderedAndProject avoids a full sort)."""
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order)
        return df.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= k
        ).drop("_rn")
    return df.orderBy(*order).limit(k)
