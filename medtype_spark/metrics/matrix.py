"""Set-matching contingency metrics + micro/macro grouped evaluation.

Reimplements neleval's ``Matrix`` algebra and grouped evaluation:

- contingency: tp/fp/fn from gold vs system key sets
  (medtype-trainer/neleval/neleval/annotation.py:345-379 ``count_matches``),
  with the multi-valued gold OR-join semantics of ``intersect``
  (annotation.py:326-342): a gold row matches if ANY of its |-split ids
  equals a system key, counted once.
- P/R/F derivation with zero-denominator → 0.0
  (neleval/evaluate.py:272-279).
- micro = sum of counts across groups; macro = unweighted mean of the
  per-group derived P/R/F (neleval/evaluate.py:118-134, 288-296).

Everything decomposes into join + two-level groupBy — map-side partial
aggregation applies, so the contingency counts never centralize rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _safe_div(num, den):
    return F.when(den == 0, F.lit(0.0)).otherwise(num / den)


def prf_cols(tp="tp", fp="fp", fn="fn"):
    p = _safe_div(F.col(tp), F.col(tp) + F.col(fp))
    r = _safe_div(F.col(tp), F.col(tp) + F.col(fn))
    f = F.when((p + r) == 0, F.lit(0.0)).otherwise(2 * p * r / (p + r))
    return p.alias("precision"), r.alias("recall"), f.alias("fscore")


def contingency_prf(
    gold: DataFrame,
    system: DataFrame,
    keys: list[str],
    group_by: list[str] | None = None,
    gold_multi_col: str | None = None,
) -> DataFrame:
    """tp/fp/fn (+P/R/F) between gold and system over exact key match.

    ``keys`` are the match columns (e.g. docid,start,end,eid).  If
    ``gold_multi_col`` names a |-delimited multi-id column it is
    exploded with existential (match-any, count-once) semantics per
    annotation.py:326-342.  ``group_by`` adds per-group rows (A3).
    """
    group_by = group_by or []

    g = gold
    if gold_multi_col is not None:
        g = (
            gold.withColumn("_gid", F.monotonically_increasing_id())
            .withColumn(gold_multi_col, F.explode(F.split(F.col(gold_multi_col), r"\|")))
        )
    else:
        g = gold.withColumn("_gid", F.monotonically_increasing_id())

    s = system.dropDuplicates(keys + group_by)

    hit = g.join(s.select(*keys, *[c for c in group_by if c not in keys]), keys, "left_semi")
    # count each gold row once even if several of its split ids matched
    tp = hit.select("_gid", *group_by).dropDuplicates(["_gid"])

    gold_n = gold.groupBy(*group_by).agg(F.count(F.lit(1)).alias("n_gold")) if group_by else gold.agg(F.count(F.lit(1)).alias("n_gold"))
    sys_n = s.groupBy(*group_by).agg(F.count(F.lit(1)).alias("n_sys")) if group_by else s.agg(F.count(F.lit(1)).alias("n_sys"))
    tp_n = tp.groupBy(*group_by).agg(F.count(F.lit(1)).alias("tp")) if group_by else tp.agg(F.count(F.lit(1)).alias("tp"))

    if group_by:
        base = gold_n.join(sys_n, group_by, "full_outer").join(tp_n, group_by, "full_outer")
    else:
        base = gold_n.crossJoin(sys_n).crossJoin(tp_n)

    counts = base.select(
        *group_by,
        F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        (F.coalesce(F.col("n_sys"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0))).alias("fp"),
        (F.coalesce(F.col("n_gold"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0))).alias("fn"),
    )
    return counts.select("*", *prf_cols())


def micro_macro(per_group: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a per-group contingency table into micro + macro rows.

    micro: sum tp/fp/fn then derive P/R/F (evaluate.py:131-134).
    macro: unweighted mean of per-group P/R/F (evaluate.py:288-296).
    Returns (agg_mode, tp, fp, fn, precision, recall, fscore).

    (r6) Both rows come out of ONE aggregation: the old
    union-of-two-aggs duplicated the whole upstream plan (every scan,
    join and exchange feeding ``per_group`` ran twice).  The single agg
    computes the count sums and the macro averages together, then
    explodes a 2-element struct array into the micro/macro rows —
    identical values, half the work.
    """
    both = per_group.agg(
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
        F.avg("precision").alias("_ma_p"),
        F.avg("recall").alias("_ma_r"),
        F.avg("fscore").alias("_ma_f"),
    )
    micro_p, micro_r, micro_f = prf_cols()
    rows = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("micro").alias("agg_mode"),
                    F.col("tp"), F.col("fp"), F.col("fn"),
                    micro_p, micro_r, micro_f,
                ),
                F.struct(
                    F.lit("macro").alias("agg_mode"),
                    F.col("tp"), F.col("fp"), F.col("fn"),
                    F.col("_ma_p").alias("precision"),
                    F.col("_ma_r").alias("recall"),
                    F.col("_ma_f").alias("fscore"),
                ),
            )
        ).alias("_row")
    )
    return rows.select("_row.*")
