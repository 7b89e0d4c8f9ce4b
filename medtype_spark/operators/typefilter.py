"""The MedType candidate filter (J8): type-semijoin with fallbacks.

Exact semantics from
medtype-as-service/server/medtype_serving/server/__init__.py:524-544:

1. empty predicted-type set  → keep the original candidate list;
2. else keep candidates whose entity types intersect the predicted set
   (missing entity in the type map ⇒ empty set ⇒ dropped);
3. if the filtered list is empty → fall back to the original list.

Order of surviving candidates is preserved (candidate lists are
best-first; top-candidate selection downstream relies on it).

Implementation: posexplode → **broadcast** join against the entity→types
dimension (analogue of ``umls2type``; 57k entities in the reference ⇒
a few MB, always broadcastable) → re-assemble with ``sort_array`` on
the carried position.  No Python; entirely whole-stage-codegen-able
except the shuffle back to mention grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_candidates_map(
    mentions: DataFrame,
    entity_types: dict[str, list[str]],
    cand_col: str = "candidates",
    pred_col: str = "pred_type",
    out_col: str = "filtered_candidates",
    eid_col: str = "eid",
) -> DataFrame:
    """Shuffle-free J8: the entity→types dimension as a ``create_map``
    literal + higher-order ``filter`` over the candidate array.

    Same three-branch semantics as ``filter_candidates`` (empty
    prediction keeps all; empty survivor set falls back; order
    preserved — trivially, since ``filter`` never reorders), but zero
    exchanges: the whole operation is one whole-stage-codegen
    projection.  Use for dimensions small enough to inline in the plan
    (≲ a few thousand entities); the join-based variant is the general
    path (57k-entity UMLS scale, where a map literal would bloat every
    task's plan).
    """
    from itertools import chain

    pairs = chain.from_iterable(
        (F.lit(k), F.array(*[F.lit(t) for t in sorted(v)]))
        for k, v in sorted(entity_types.items())
    )
    m = F.create_map(*pairs)

    kept = F.filter(
        F.col(cand_col),
        lambda c: F.size(
            F.array_intersect(
                F.coalesce(m[c[eid_col]], F.array().cast("array<string>")),
                F.col(pred_col),
            )
        )
        > 0,
    )
    out = (
        F.when(F.size(F.coalesce(F.col(pred_col), F.array().cast("array<string>"))) == 0,
               F.col(cand_col))
        .when(F.size(kept) == 0, F.col(cand_col))
        .otherwise(kept)
    )
    return mentions.withColumn(out_col, out)


def filter_candidates(
    mentions: DataFrame,
    entity_types: DataFrame,
    cand_col: str = "candidates",
    pred_col: str = "pred_type",
    out_col: str = "filtered_candidates",
    eid_col: str = "eid",
    types_col: str = "types",
) -> DataFrame:
    """Append ``out_col`` (same element type as ``cand_col``).

    ``mentions``: any schema containing ``cand_col``
    (array<struct<eid,...>>) and ``pred_col`` (array<string>).
    ``entity_types``: dimension (eid, types:array<string>).
    """
    base = mentions.withColumn("_rid", F.monotonically_increasing_id())

    exploded = base.select(
        "_rid",
        F.col(pred_col).alias("_pred"),
        F.posexplode(cand_col).alias("_pos", "_cand"),
    )
    dim = entity_types.select(
        F.col(eid_col).alias("_eid"), F.col(types_col).alias("_etypes")
    )
    joined = exploded.join(
        F.broadcast(dim), exploded["_cand"][eid_col] == dim["_eid"], "left"
    )
    kept = (
        joined.where(
            F.size(
                F.array_intersect(
                    F.coalesce(F.col("_etypes"), F.array().cast("array<string>")),
                    F.col("_pred"),
                )
            )
            > 0
        )
        .groupBy("_rid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_cand"))),
                lambda x: x["_cand"],
            ).alias("_kept")
        )
    )

    result = base.join(kept, "_rid", "left").withColumn(
        out_col,
        F.when(F.size(F.coalesce(F.col(pred_col), F.array().cast("array<string>"))) == 0, F.col(cand_col))
        .when(F.size(F.coalesce(F.col("_kept"), F.expr("array()"))) == 0, F.col(cand_col))
        .otherwise(F.col("_kept")),
    )
    return result.drop("_rid", "_kept")
