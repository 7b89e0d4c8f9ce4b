"""Span validation pass (neleval/document.py:28-62).

The reference sweeps each document's annotations and classifies every
overlapping pair as duplicate / nested / crossing (``compare_spans``,
annotation.py:65-73), then ignores / warns / errors per category
according to ``Document.VALIDATION``.

Spark restatement: the sweep IS an interval self-join banded by docid
(operators/intervals.py) — per-document pair work exactly like the
reference, never a global product — followed by a JVM-side CASE
classification and a per-category count.  ``validate_spans`` returns
the issue pairs as a DataFrame; the warn/error policies need the
category counts, which is one tiny aggregate.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference default: all ignore (document.py:29-33)
DEFAULT_POLICY = {"duplicate": "ignore", "nested": "ignore", "crossing": "ignore"}


def classify_span_pairs(ann: DataFrame) -> DataFrame:
    """All intra-document overlapping annotation pairs with their
    compare_spans category (duplicate | nested | crossing).

    Input needs (docid, start, end); extra columns are ignored.
    Each unordered pair appears once.
    """
    from medtype_spark.operators.intervals import interval_join

    base = ann.select("docid", "start", "end").withColumn(
        "_aid", F.monotonically_increasing_id()
    )
    pairs = interval_join(base, base, band_key="docid").where(
        F.col("_aid") < F.col("_aid_r")
    )

    s, e = F.col("start"), F.col("end")
    s2, e2 = F.col("start_r"), F.col("end_r")
    category = (
        F.when((s == s2) & (e == e2), "duplicate")
        .when((s < s2) & (e >= e2), "nested")
        .when((s >= s2) & (e < e2), "nested")
        .otherwise("crossing")
    )
    return pairs.select(
        "docid",
        s.alias("a_start"), e.alias("a_end"),
        s2.alias("b_start"), e2.alias("b_end"),
        category.alias("category"),
    )


def validate_spans(
    ann: DataFrame, policy: dict[str, str] | None = None
) -> DataFrame:
    """Apply the ignore/warn/error policy; returns the issue pairs.

    Raises ``ValueError`` for the first category whose policy is
    'error' and which has offending pairs (document.py:54-58); emits a
    ``UserWarning`` per non-empty 'warn' category (document.py:59-62).
    Categories left at 'ignore' are not even counted.
    """
    policy = {**DEFAULT_POLICY, **(policy or {})}
    active = [c for c, v in policy.items() if v != "ignore"]
    issues = classify_span_pairs(ann).where(F.col("category").isin(active) if active else F.lit(False))
    if not active:
        return issues

    counts = {r["category"]: r["n"] for r in
              issues.groupBy("category").agg(F.count(F.lit(1)).alias("n")).collect()}
    for cat in active:
        n = counts.get(cat, 0)
        if not n:
            continue
        sample = issues.where(F.col("category") == cat).first()
        msg = (
            f"Found annotations with {cat} span: "
            f"{sample['docid']} ({sample['a_start']},{sample['a_end']}) vs "
            f"({sample['b_start']},{sample['b_end']}) — {n} pair(s)"
        )
        if policy[cat] == "error":
            raise ValueError(msg)
        warnings.warn(msg)
    return issues
