"""CEAF (A9): optimal 1:1 cluster alignment metrics.

Reimplements neleval's mention/entity CEAF
(medtype-trainer/neleval/neleval/coref_metrics.py:443-471; similarity
functions :343-382; decomposition :392-440) Spark-first:

- the true×pred similarity CONTINGENCY (only overlapping cluster
  pairs) is computed distributed (join + groupBy) — this is the part
  that scales with data;
- the assignment problem is decomposed by connected components of the
  cluster-overlap graph (exactly the reference's
  ``_disjoint_max_assignment`` trick, :407-440) and each component's
  (small, dense) subproblem is solved with a pure-numpy Hungarian
  algorithm on the driver — no scipy in this environment.

similarity='overlap' → mention_ceaf (num = |t∩p|, self-sim = |c|);
similarity='dice'    → entity_ceaf (num = 2|t∩p|/(|t|+|p|), self = 1).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medtype_spark.metrics.clustering import prf_row


def _hungarian_max(cost: np.ndarray) -> float:
    """Maximum-weight assignment total for a (possibly rectangular)
    dense matrix — O(n^3) Jonker-style augmenting-path algorithm."""
    if cost.size == 0:
        return 0.0
    # pad to square, maximize = minimize negated
    n = max(cost.shape)
    m = np.zeros((n, n), dtype=np.float64)
    m[: cost.shape[0], : cost.shape[1]] = -cost
    INF = 1e18
    u = np.zeros(n + 1)
    v = np.zeros(n + 1)
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row assigned to col j
    way = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, INF)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            delta = INF
            j1 = 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = m[i0 - 1, j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    total = 0.0
    for j in range(1, n + 1):
        if p[j] != 0:
            total += m[p[j] - 1, j - 1]
    return -total


def _components(pairs):
    """Union-find over the (tc, pc) bipartite overlap graph."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for tc, pc, _ in pairs:
        a, b = ("t", tc), ("p", pc)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for tc, pc, sim in pairs:
        comps.setdefault(find(("t", tc)), []).append((tc, pc, sim))
    return comps.values()


def ceaf(
    true: DataFrame,
    pred: DataFrame,
    mention: str = "mention",
    cluster: str = "cluster",
    similarity: str = "overlap",
) -> DataFrame:
    """Returns 1-row (p_num,p_den,r_num,r_den,precision,recall,fscore).

    per coref_metrics.py:443-449: num = max-assignment similarity;
    p_den = Σ_p sim(p,p); r_den = Σ_t sim(t,t).
    """
    spark = true.sparkSession
    t = true.select(F.col(mention).alias("m"), F.col(cluster).alias("c")).dropDuplicates()
    p = pred.select(F.col(mention).alias("m"), F.col(cluster).alias("c")).dropDuplicates()

    inter = (
        t.join(p.withColumnRenamed("c", "pc"), "m")
        .groupBy("c", "pc")
        .agg(F.count(F.lit(1)).alias("n_tp"))
    )
    t_sizes = {r["c"]: r["n"] for r in t.groupBy("c").agg(F.count(F.lit(1)).alias("n")).collect()}
    p_sizes = {r["c"]: r["n"] for r in p.groupBy("c").agg(F.count(F.lit(1)).alias("n")).collect()}

    rows = inter.collect()
    if similarity == "overlap":
        pairs = [(r["c"], r["pc"], float(r["n_tp"])) for r in rows]
        p_den = float(sum(p_sizes.values()))
        r_den = float(sum(t_sizes.values()))
    elif similarity == "dice":
        pairs = [
            (r["c"], r["pc"], 2.0 * r["n_tp"] / (t_sizes[r["c"]] + p_sizes[r["pc"]]))
            for r in rows
        ]
        p_den = float(len(p_sizes))
        r_den = float(len(t_sizes))
    else:
        raise ValueError(similarity)

    # decompose into overlap components (coref_metrics.py:407-440),
    # Hungarian per component
    num = 0.0
    for comp in _components(pairs):
        tcs = sorted({tc for tc, _, _ in comp}, key=str)
        pcs = sorted({pc for _, pc, _ in comp}, key=str)
        mat = np.zeros((len(tcs), len(pcs)))
        ti = {c: i for i, c in enumerate(tcs)}
        pi = {c: i for i, c in enumerate(pcs)}
        for tc, pc, sim in comp:
            mat[ti[tc], pi[pc]] = sim
        num += _hungarian_max(mat)

    row = spark.createDataFrame(
        [(float(num), float(p_den), float(num), float(r_den))],
        "p_num:double, p_den:double, r_num:double, r_den:double",
    )
    return prf_row(row)


def mention_ceaf(true, pred, **kw):
    return ceaf(true, pred, similarity="overlap", **kw)


def entity_ceaf(true, pred, **kw):
    return ceaf(true, pred, similarity="dice", **kw)
