"""Connected components via alternating large-star / small-star.

GraphFrames-free transitive clustering: iterative DataFrame self-joins
with checkpointed lineage, per the north rule.  The reference reaches
for connected components twice — scipy ``csgraph.connected_components``
to decompose the CEAF assignment problem
(medtype-trainer/neleval/neleval/coref_metrics.py:407-440) and the
implicit transitive closure of entity clusters — but both are
single-process.  Here we use the alternating algorithm of Kiveris et
al., "Connected Components in MapReduce and Beyond" (SOCC 2014), which
converges in O(log^2 n) rounds even on path graphs (where naive
min-label propagation needs O(diameter) rounds — fatal at 10^12-doc
scale).

Each round is two (groupBy + join) stages — no collect_list of
neighborhoods, so hub nodes with millions of neighbors never
materialize a row-local adjacency list.  Lineage is truncated with
``localCheckpoint`` every round; convergence is detected by an
order-insensitive edge-set fingerprint (count + sum of xxhash64),
which costs one cheap aggregate instead of a full sort/compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fingerprint(edges: DataFrame) -> tuple:
    # decimal(38,0) sum: overflow-safe under ANSI mode (Spark 4 default)
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def _driver_union_find_pdf(pdf, e: DataFrame) -> DataFrame:
    """Exact min-label components for a small collected edge set
    (path-compressed union-find), returned as a DataFrame
    (node, component) covering every edge-touched node."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for u, v in zip(pdf["u"].tolist(), pdf["v"].tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)

    import pandas as _pd

    rows = [(x, find(x)) for x in list(parent)] + [
        (r, r) for r in set(map(find, parent))
    ]
    spark = e.sparkSession
    schema = T.StructType([
        T.StructField("node", e.schema["u"].dataType),
        T.StructField("component", e.schema["u"].dataType),
    ])
    # (r6) Arrow pandas path instead of parallelize(rows): the row-RDD
    # form pickled every label through python tasks at each downstream
    # action (the r5 fix capped it at 1-2 slices, but those tasks still
    # fork python workers); createDataFrame(pandas) ships ONE Arrow
    # batch into the JVM at build time — zero python tasks in the
    # returned lineage.
    pdf_out = _pd.DataFrame(rows, columns=["node", "component"])
    return spark.createDataFrame(pdf_out, schema)


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m(u)) for every neighbor v > u, where m(u)=min(Γ(u) ∪ {u})."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least("mv", "u").alias("m")
    )
    # no distinct here: duplicates survive one hop into small_star's
    # groupBy (which dedups implicitly) — saves a shuffle per round
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large→small, then link all small neighbors to the min."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    joined = oriented.join(mins, "u")
    neighbor_links = joined.select(F.col("v").alias("u"), F.col("m").alias("v")).where(
        F.col("u") != F.col("v")
    )
    self_links = mins.select("u", F.col("m").alias("v"))
    return neighbor_links.union(self_links).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    vertex_col: str = "node",
    max_iter: int = 50,
    check_every: int = 2,
    small_graph_threshold: int | None = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Label each node with the minimum node id of its component.

    Parameters
    ----------
    edges : DataFrame with columns ``src``, ``dst`` (any orderable type).
    vertices : optional DataFrame of all nodes (``vertex_col``); isolated
        nodes (no edges) get their own id as component label.
    small_graph_threshold : adaptive execution cutover — a deduplicated
        edge set at or below this size is solved by a driver-side
        union-find (one collect + one createDataFrame) instead of
        O(log² n) distributed rounds.  The iterative rounds each cost a
        full job of fixed scheduling overhead; on a vocabulary-grain
        graph (the flagship's form graph is ~10³-10⁶ edges even at
        10¹²-document corpus scale, because it is Zipf-vocabulary-sized)
        that overhead IS the runtime.  Labels are identical on both
        paths (min node id per component — parity-tested); pass None
        to force the distributed algorithm.
    stats : optional dict, filled in place with execution evidence:
        ``path`` ("empty" | "small" | "distributed"), ``n_edges``
        (small path: exact count from the complete probe), ``rounds``
        (distributed path: alternating-star rounds executed).

    Returns DataFrame(node, component).
    """
    spark = edges.sparkSession
    # lazy: the small-graph path consumes the edge set exactly once —
    # the probe fetch is its ONLY action over this lineage (the
    # returned plan is built from the collected probe rows plus
    # ``vertices``, never from ``e``) — so pinning it with an eager
    # checkpoint here would cost a whole extra materialization job;
    # the distributed path checkpoints before iterating (below).
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .distinct()
    )

    def _vertices_self_labeled():
        return vertices.select(F.col(vertex_col).alias("node")).distinct().select(
            "node", F.col("node").alias("component")
        )

    if small_graph_threshold is not None:
        # one job decides AND fetches: limit(t+1).toPandas() returning
        # ≤ t rows proves the edge set is complete (≤ t edges total),
        # so the separate count() job disappears from the common path
        probe = e.limit(small_graph_threshold + 1).select("u", "v").toPandas()
        if stats is not None and len(probe) <= small_graph_threshold:
            stats["path"] = "empty" if len(probe) == 0 else "small"
            stats["n_edges"] = len(probe)
        if len(probe) == 0:
            if vertices is None:
                return spark.createDataFrame([], T.StructType([
                    T.StructField("node", e.schema["u"].dataType),
                    T.StructField("component", e.schema["u"].dataType),
                ]))
            return _vertices_self_labeled()
        if len(probe) <= small_graph_threshold:
            # the probe IS the complete edge set, so union-find labels
            # cover every edge-touched node; only isolated vertices
            # (in ``vertices`` but untouched by any edge) are added,
            # self-labeled, via a broadcast anti-join — the edge
            # lineage is not consumed again
            labels = _driver_union_find_pdf(probe, e)
            if vertices is None:
                return labels
            iso = (
                vertices.select(F.col(vertex_col).alias("node")).distinct()
                .join(F.broadcast(labels.select("node")), "node", "left_anti")
                .select("node", F.col("node").alias("component"))
            )
            return labels.unionByName(iso)
    elif e.isEmpty():
        if stats is not None:
            stats["path"] = "empty"
            stats["n_edges"] = 0
        if vertices is None:
            return spark.createDataFrame([], T.StructType([
                T.StructField("node", e.schema["u"].dataType),
                T.StructField("component", e.schema["u"].dataType),
            ]))
        return _vertices_self_labeled()

    all_nodes = e.select(F.col("u").alias(vertex_col)).union(
        e.select(F.col("v").alias(vertex_col))
    )
    if vertices is not None:
        all_nodes = all_nodes.union(vertices.select(F.col(vertex_col)))
    all_nodes = all_nodes.distinct()

    # distributed path: pin the deduplicated edge set so each
    # alternating-star round starts from materialized lineage
    e = e.localCheckpoint()

    # Convergence is detected by an edge-set fingerprint, one cheap
    # aggregate job.  ``check_every`` batches rounds per fingerprint:
    # each round's dominant cost on short graphs is fixed job/stage
    # overhead, so checking every 2nd round halves the job count at the
    # price of at most one redundant (idempotent) round after the
    # fixpoint — a large win when CC runs inside a benchmarked pipeline.
    # distributed rounds consume all_nodes only after convergence, but
    # pin it now so the final join never recomputes upstream python
    # lineage that the iteration already paid for
    all_nodes = all_nodes.localCheckpoint(eager=False)

    if stats is not None:
        stats["path"] = "distributed"
    prev_fp = None
    rounds = 0
    while rounds < max_iter:
        for _ in range(min(check_every, max_iter - rounds)):
            # lazy checkpoint: the fingerprint aggregate materializes
            # the batch, so the batch costs one job total
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            rounds += 1
        fp = _fingerprint(e)
        if stats is not None:
            stats["rounds"] = rounds
        if fp == prev_fp:
            break
        prev_fp = fp

    # Converged: every edge points node → component-min (stars).  A node
    # may still appear as the root only; fill with self-label.
    labels = e.groupBy("u").agg(F.min("v").alias("component")).select(
        F.col("u").alias("node"), "component"
    )
    return (
        all_nodes.select(F.col(vertex_col).alias("node"))
        .join(labels, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )
