"""Pairwise scoring inside blocks: Jaro-Winkler + embedding cosine.

The reference scores candidates two ways: QuickUMLS approximate string
similarity with a 0.6 threshold (entity_linkers.py:50-70, threshold at
:58) and ScispaCy alias-embedding nearest-neighbour scores
(entity_linkers.py:25-46).  Here both become vectorized column
functions over the canonical pairs table produced by
operators/blocking.block_pairs:

- ``jaro_winkler_udf`` — Arrow-batched pandas UDF (Spark has no builtin
  JW).  Strings within a block are short surface forms, so the per-pair
  O(len^2) scan is cheap; batching amortizes serialization.
- ``cosine_sim`` — pure JVM: zip_with + aggregate, no Python at all.

``score_pairs`` combines them with the reference-style rounding
(entity_linkers.py:44 rounds scores to 3 dp).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched chars in order
    k = 0
    t = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    """Standard Jaro-Winkler (common prefix boost, cap 4 chars)."""
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * prefix_scale * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    out = np.empty(len(av), dtype=np.float64)
    for i in range(len(av)):
        out[i] = jaro_winkler(av[i], bv[i])
    return pd.Series(out)


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two array<float|double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity, 0.0 when either side is a zero vector."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def score_pairs(
    pairs: DataFrame,
    a_text: str = "a_mention",
    b_text: str = "b_mention",
    a_vec: str | None = None,
    b_vec: str | None = None,
    jw_weight: float = 0.5,
    out_col: str = "score",
) -> DataFrame:
    """Blend string and embedding similarity; round to 3 dp as the
    reference does for candidate scores (entity_linkers.py:44)."""
    jw = jaro_winkler_udf(F.col(a_text), F.col(b_text))
    if a_vec is not None and b_vec is not None:
        cos = cosine_sim(F.col(a_vec), F.col(b_vec))
        blended = F.lit(jw_weight) * jw + F.lit(1.0 - jw_weight) * cos
        # rows missing an embedding on either side fall back to pure JW
        score = F.when(
            F.col(a_vec).isNull() | F.col(b_vec).isNull(), jw
        ).otherwise(blended)
    else:
        score = jw
    return pairs.withColumn(out_col, F.round(score, 3))
