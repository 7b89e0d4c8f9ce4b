"""Named, oracle-checkable queries over the driver testdata.

Each entry pairs a Spark DataFrame implementation (built on the
medtype_spark operator library) with an equivalent DuckDB SQL string
(see ``ORACLES``).  The driver runs both at sf=0.01 and compares
row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- every double is rounded (6 dp; money 2 dp) on both sides to absorb
  float summation-order differences;
- no query depends on wall-clock, session time zone, or partitioning.

Query numbering groups: q0x relational core, q1x text/dedup, q2x
similarity/clustering-metrics, q3x linkage-specific operators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from medtype_spark.dedup.exact import exact_dedup
from medtype_spark.dedup.minhash import (
    capped_candidate_pairs,
    doc_shingles,
    lsh_candidate_pairs,
    simhash64,
)
from medtype_spark.functions.text import (
    clean_collapse_udf,
    clean_text_udf,
    normalise_link_col,
)
from medtype_spark.metrics.clustering import b_cubed, muc, pairwise
from medtype_spark.metrics.matrix import contingency_prf, micro_macro
from medtype_spark.operators.blocking import block_pairs
from medtype_spark.operators.cc import connected_components
from medtype_spark.operators.intervals import interval_join, overlap_score_max
from medtype_spark.operators.topk import mark_first_mention, topk_by
from medtype_spark.similarity.knn import brute_force_topk
from medtype_spark.textstats.quality import (
    STOPWORDS,
    predict_lang,
    quality_features,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(col):
    return F.round(col, 6)


# ----------------------------------------------------------------------
# q0x — relational core (scans, joins, aggs, windows)
# ----------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: partial-agg friendly groupBy (A1/A2/A3)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q03_top_order_per_cust(spark, sf_dir):
    """W1 analogue: best row per key via row_number window."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def q04_cust_nation_stats(spark, sf_dir):
    """Broadcast dim join + two-level agg (J1/J2)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count_distinct("c_custkey").alias("n_customers"),
        )
    )


def q05_order_fill_class(spark, sf_dir):
    """Full-outer classification (J4/J13): orders vs lineitem keys."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    lk = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey")).distinct()
    joined = o.join(lk, o["o_orderkey"] == lk["l_orderkey"], "full_outer")
    cls = (
        F.when(F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNotNull(), "both")
        .when(F.col("o_orderkey").isNotNull(), "order_only")
        .otherwise("lineitem_only")
    )
    return joined.select(cls.alias("match_class")).groupBy("match_class").agg(
        F.count(F.lit(1)).alias("n")
    )


def q06_semi_anti_join(spark, sf_dir):
    """Set operations §2.8 in one frame: existential semi-join (J3,
    customers with a filled order) unioned with an anti-join
    (set-except analogue, orders with no lineitems)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    semi = c.join(
        o.where(F.col("o_orderstatus") == "F"),
        c["c_custkey"] == o["o_custkey"],
        "left_semi",
    ).select(
        F.lit("semi").alias("side"),
        F.col("c_custkey").alias("key"),
        F.col("c_mktsegment").alias("attr"),
    )
    anti = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_anti").select(
        F.lit("anti").alias("side"),
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("attr"),
    )
    return semi.unionByName(anti)


def q08_token_topk(spark, sf_dir):
    """Explode + count + deterministic top-k (P7 + top-k).

    (r6) fan_out: the split/explode map work ran in ONE task on the
    single-row-group test scan; a cheap repartition spreads it."""
    from medtype_spark.session import fan_out

    d = fan_out(_t(spark, sf_dir, "documents").select("text"))
    toks = d.select(
        F.explode(F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return topk_by(counts, [F.desc("n"), F.asc("token")], 20)


def q10_interval_overlap_counts(spark, sf_dir):
    """J6 interval-overlap counting banded by user: overlapping 5-min
    windows.

    (r6) Window-sweep formulation.  Every interval here is the SAME
    length ([ts, ts+5min]), so two events of one user overlap iff
    |Δts| <= 5 min, and the per-user pair count is a sliding-range
    count — no self-join.  With event_id a verified primary key at
    every SF (the a<b ordering admits every unordered row pair exactly
    once), the count per user is

        Σ_i (n_le_i − 1) − Σ_i (n_eq_i − 1)/2

    where n_le = events in [ts−5min, ts] (each strict pair counted
    once, at the later event; ties twice) and n_eq = events tied on ts
    (de-dups the double-counted ties).  One shuffle + an O(n) range
    frame replaces the O(Σ k_u²) per-user quadratic join — identical
    results, proven against the unchanged self-join oracle.
    Microsecond integer arithmetic: ts has sub-second precision, and
    timestamp_diff is exact (timestamps are i64 micros internally), so
    the inclusive ±5-min boundary matches the join predicate bit-wise.
    Preconditions (both hold by generator construction at every SF,
    verified): event_id unique; ts non-null (the join form drops
    null-ts rows via three-valued comparisons, the window form would
    group null sort keys as peers).
    """
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    epoch = F.lit("1970-01-01 00:00:00").cast(e.schema["ts"].dataType)
    e = e.select("user_id", F.timestamp_diff("MICROSECOND", epoch, F.col("ts")).alias("us"))
    w_le = Window.partitionBy("user_id").orderBy("us").rangeBetween(-300_000_000, 0)
    w_eq = Window.partitionBy("user_id").orderBy("us").rangeBetween(0, 0)
    counts = e.select(
        "user_id",
        F.count(F.lit(1)).over(w_le).alias("n_le"),
        F.count(F.lit(1)).over(w_eq).alias("n_eq"),
    )
    per_user = counts.groupBy("user_id").agg(
        (
            (F.sum("n_le") - F.count(F.lit(1)))
            - F.shiftright(F.sum("n_eq") - F.count(F.lit(1)), 1)
        ).alias("n_overlaps")
    )
    return per_user.where(F.col("n_overlaps") > 0)


def q11_sliding_stats(spark, sf_dir):
    """W6: last-200-rows sliding stats per user (ServerStatistic
    analogue, .../server/__init__.py:629-633).

    Aggregates exact integer cents: window-function association order
    differs between engines, so float sums are not reproducible, but
    integer sums are.

    Merged (r5): keyed AS-OF JOIN (`operators/asof.py`) — every event
    also carries the most recent 'click' event at-or-before its
    timestamp for the same user (click-attribution shape; warc_ts
    re-crawl lookups at web scale).  The oracle uses DuckDB's NATIVE
    ``ASOF LEFT JOIN`` operator, so Spark's union-tag + running-last
    formulation is checked against an independent engine
    implementation, not a replay of the same algorithm.  The delta is
    integer microseconds — no float order sensitivity."""
    from medtype_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-199, 0)
    )
    stats = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("cents").over(w).alias("sum_cents_200"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("last_click_id"),
        )
    )
    joined = asof_join(
        stats,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        payload_cols=["last_click_id", "click_ts"],
        tiebreak="last_click_id",
    )
    # no-prior-click rows use a -1 sentinel instead of NULL so both
    # engines hash the column as a non-nullable BIGINT (pandas turns a
    # nullable int into float NaN on one side and object None on the
    # other — a representation mismatch, not a value difference)
    return joined.select(
        "user_id",
        "event_id",
        "sum_cents_200",
        "n_window",
        F.coalesce(F.col("last_click_id"), F.lit(-1)).alias("last_click_id"),
        # timestamp_diff is NTZ-safe (unix_micros rejects TIMESTAMP_NTZ)
        F.coalesce(
            F.timestamp_diff("MICROSECOND", F.col("click_ts"), F.col("ts")),
            F.lit(-1),
        ).alias("since_click_us"),
    )


def q12_micro_macro(spark, sf_dir):
    """A3: grouped contingency eval + micro/macro lattice.

    (r6) Single-pass formulation mirroring the oracle's arithmetic
    exactly: the 4-part line key is unique by construction in the
    driver data, so "gold key ∈ system keys" reduces to the row-local
    predicate tp = (returnflag='R' AND discount>0.05) — precisely the
    CASE WHEN sums the (unchanged) oracle SQL states.  One map-side-
    combinable groupBy over a 3-column projection replaces the old
    join/dedup cascade (36 Exchanges → 3, five lineitem scans → one).
    """
    from medtype_spark.metrics.matrix import prf_cols

    li = _t(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_returnflag", "l_discount"
    )
    gold = F.col("l_returnflag") == "R"
    system = F.col("l_discount") > 0.05
    per_group = (
        li.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(gold & system, 1).otherwise(0)).alias("tp"),
            F.sum(F.when((~gold) & system, 1).otherwise(0)).alias("fp"),
            F.sum(F.when(gold & (~system), 1).otherwise(0)).alias("fn"),
        )
        .where((F.col("tp") + F.col("fp") > 0) | (F.col("tp") + F.col("fn") > 0))
        .select("*", *prf_cols())
    )
    out = micro_macro(per_group, ["l_linestatus"])
    return out.select(
        "agg_mode", "tp", "fp", "fn",
        _r6(F.col("precision")).alias("precision"),
        _r6(F.col("recall")).alias("recall"),
        _r6(F.col("fscore")).alias("fscore"),
    )


# ----------------------------------------------------------------------
# q1x — text normalization / dedup / text stats
# ----------------------------------------------------------------------

def q13_clean_text(spark, sf_dir):
    """P1 clean_text (digest form, byte-identical invariant) + P2
    collapse_char (the quirky run-collapsing loop, server
    helper.py:271-288, applied after clean_text as the reference does)
    + P5 wikipedia link normalization over a derived URL column
    (formerly q20; merged to keep the registry inside the driver's
    50-query window) + crawl-URL canonicalization / registered-domain
    extraction (`functions/urls.py` — the cheapest dedup key for the
    BASELINE input_hint's url-keyed pages table) over six deterministic
    messy-URL variants derived from doc_id — all are per-doc JVM
    projections over the same scan.  The URL oracle states the
    EXPECTED canonical form per variant by hand (independent of the
    implementation's regex pipeline), so the contract itself is what
    the driver checks.

    Merged (r5b): CCNet-style corpus-level duplicate-line removal
    (`dedup/lines.py`) over deterministic 8-token chunk "lines" (the
    raw synthetic docs are single-line; chunking turns the cross-doc
    shared runs that q14's shared-8-gram stats already prove exist
    into removable duplicate lines).

    Merged (r5c): PII scrubbing (`functions/pii.py`) over text laced
    with deterministic doc_id-derived contact fragments (the base
    corpus contains no digits or '@' — verified at every sf — so the
    oracle can state the scrubbed text BY CONSTRUCTION and the driver
    checks the regexes against ground truth, not a regex replay)."""
    from medtype_spark.dedup.lines import dedup_corpus_lines
    from medtype_spark.functions.pii import pii_counts, scrub_pii
    from medtype_spark.functions.urls import (
        canonicalize_url,
        registered_domain,
        url_host,
    )

    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nch = F.greatest(F.ceil(F.size(toks) / F.lit(8)).cast("int"), F.lit(1))
    chunked = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
    )
    lined = d.select("doc_id", F.array_join(chunked, "\n").alias("lt"))
    ld = dedup_corpus_lines(lined, "lt", "doc_id", min_len=20).select(
        "doc_id",
        F.md5("text_dedup").alias("line_dedup_md5"),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_dup_lines_removed").cast("long").alias("n_dup_lines_removed"),
    )
    url = F.concat(F.lit("en.wikipedia.org/wiki/"), F.col("source"), F.lit(" page"))
    did = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 40).cast("string")
    variant = F.col("doc_id") % 6
    messy = (
        F.when(variant == 0, F.concat(
            F.lit("HTTP://WWW.Site"), h, F.lit(".COM:80/a/"), did, F.lit("/")))
        .when(variant == 1, F.concat(
            F.lit("https://site"), h, F.lit(".co.uk:443/a/"), did,
            F.lit("?x=1&y=2#frag")))
        .when(variant == 2, F.concat(
            F.lit("http://user:pw@Site"), h, F.lit(".com/a/"), did, F.lit("?")))
        .when(variant == 3, F.concat(
            F.lit("https://site"), h, F.lit(".com:8443/a/"), did))
        .when(variant == 4, F.concat(
            F.lit("http://www.site"), h, F.lit(".co.uk/")))
        .otherwise(F.concat(
            F.lit("https://SITE"), h, F.lit(".Com/a/"), did, F.lit("/b/")))
    )
    canon = canonicalize_url(messy)
    p = F.col("doc_id") % 4
    laced = (
        F.when(p == 0, F.concat(
            F.col("text"), F.lit(" reach me at user"), did, F.lit("@mail"),
            (F.col("doc_id") % 7).cast("string"), F.lit(".com now")))
        .when(p == 1, F.concat(
            F.col("text"), F.lit(" call +1-555-"),
            (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
            F.lit(" soon")))
        .when(p == 2, F.concat(
            F.col("text"), F.lit(" server at 10."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".0."),
            ((F.col("doc_id") * 7) % 256).cast("string"), F.lit(" up")))
        .otherwise(F.col("text"))
    )
    counts = pii_counts(laced)
    base = d.select(
        "doc_id",
        F.md5(clean_text_udf(F.col("text"))).alias("clean_md5"),
        F.md5(clean_collapse_udf(F.col("text"))).alias("collapsed_md5"),
        normalise_link_col(url).alias("norm_link"),
        canon.alias("canon_url"),
        registered_domain(url_host(canon)).alias("reg_domain"),
        F.md5(scrub_pii(laced)).alias("scrubbed_md5"),
        counts["email"],
        counts["ipv4"],
        counts["phone"],
    )
    return base.join(ld, "doc_id")


def q14_exact_dedup(spark, sf_dir):
    """Exact (hash-groupBy) dedup + cross-document shared-8-gram stats
    (the fuzzy-substring-dedup evidence table, `dedup/crossdoc.py`),
    joined on the doc grain.

    Merged (r5): deterministic hash-keyed train/val/test split and
    Bernoulli sample flag (`operators/sampling.py`) — the
    layout-independent, engine-portable selection a growing corpus
    needs to avoid train/test leakage; the oracle replays the md5
    hex-prefix thresholds verbatim.  Also merged: exactly-5-per-lang
    exemplar sampling (`stratified_take`; 0 = not an exemplar)."""
    from medtype_spark.dedup.crossdoc import cross_doc_shared_ngrams
    from medtype_spark.operators.sampling import (
        hash_sample_flag,
        hash_split,
        stratified_take,
    )
    from medtype_spark.session import fan_out

    d = _t(spark, sf_dir, "documents")
    ex = hash_split(
        exact_dedup(d, "text", "doc_id").select(
            "doc_id", "canonical_id", "group_size"
        ),
        key="doc_id",
    ).withColumn(
        "in_sample",
        hash_sample_flag(F.col("doc_id"), 0.2, salt="s1").cast("int"),
    )
    ex5 = stratified_take(d.select("doc_id", "lang"), "doc_id", ["lang"], k=5)
    ex = ex.join(
        ex5.select("doc_id", "lang", "strat_rank"), "doc_id", "left"
    ).withColumn("exemplar_rank", F.coalesce(F.col("strat_rank"), F.lit(0))) \
     .drop("strat_rank", "lang")
    shared = cross_doc_shared_ngrams(fan_out(d), "text", "doc_id", n=8)
    return ex.join(shared, "doc_id")


def q15_minhash(spark, sf_dir):
    """MinHash signature digest (md5 hash family, portable).

    (r6) Row-local formulation: sig[i] = array_min over the doc's
    shingle array — min() is duplicate-insensitive and a pure function
    of the document row, so the explode + hash-aggregate + doc-keyed
    exchange of the exploded form all disappear (zero shuffles after
    fan_out).  Signatures identical (pytest + unchanged oracle).
    fan_out: the md5-per-shingle map work must not serialize on a
    single-row-group test file (no-op on real multi-split scans)."""
    from medtype_spark.dedup.minhash import minhash_signatures_local
    from medtype_spark.session import fan_out

    d = fan_out(_t(spark, sf_dir, "documents").select("doc_id", "text"))
    sig = minhash_signatures_local(d, "text", "doc_id", n=3, num_hashes=8)
    return sig.select("doc_id", F.md5(F.concat_ws("|", "sig")).alias("sig_md5"))


def q16_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over the df-capped shingle space.

    Stop-phrase shingles (document frequency > 50) are excluded from
    both intersection and union (SpotSigs semantics): generation work
    is bounded per shingle AND the intersection count falls out of the
    single self-join — no join-back of pairs against posting lists."""
    from medtype_spark.dedup.minhash import capped_jaccard_pairs
    from medtype_spark.session import fan_out

    d = fan_out(_t(spark, sf_dir, "documents"))
    sh = doc_shingles(d, "text", "doc_id", n=3)
    return capped_jaccard_pairs(sh, "doc_id", df_cap=50, min_jaccard=0.1).select(
        "a", "b", _r6(F.col("jaccard")).alias("jaccard")
    )


def q17_textstats(spark, sf_dir):
    """Text-analysis suite in one frame: quality features + n-gram
    language ID + rolling fingerprint + Gopher-rule quality verdict
    (Rae et al. 2021 App. A; integer-exact threshold decisions) +
    Gopher n-gram repetition verdict (Table A1 n-gram half, one
    explode + one combiner-friendly groupBy), joined per doc (each
    operator runs as its own plan; the join key is the doc grain).

    Merged (r5): benchmark decontamination (`dedup/crossdoc.py:
    decontaminate`, the GPT-3 App.-C stage) — docs with doc_id % 37
    == 0 play the held-out benchmark; every other doc sharing any
    8-gram with that set is flagged ``contaminated``."""
    from medtype_spark.dedup.crossdoc import decontaminate
    from medtype_spark.textstats.quality import (
        fingerprint,
        gopher_quality,
        gopher_repetition,
    )

    # (r6) No fan_out anywhere: with gopher_repetition now row-local
    # (no explode/shuffle) the branches are cheap projections plus the
    # decontamination semi-join, and interleaved A/B at sf1.0 reads
    # none=1.85s < rep+contam fan_out=2.07s < contam-only=2.29s — the
    # repartitions only add exchanges here.  (A shared fan_out of all
    # six branches is far worse still: each branch prunes different
    # columns, fragmenting into 46 Exchanges / 20 scans, 5-15s.)  At
    # real scale the scans are multi-split and fan_out would be a
    # no-op anyway.
    d = _t(spark, sf_dir, "documents")
    dn = d.select("doc_id", "text")
    bench = dn.where(F.col("doc_id") % 37 == 0)
    contam = decontaminate(dn.where(F.col("doc_id") % 37 != 0), bench,
                           "text", "doc_id", n=8).unionByName(
        bench.select("doc_id", F.lit(-1).alias("contaminated"))
    )
    q = quality_features(d, "text", "doc_id").select(
        "doc_id", "n_chars", "n_tokens", "n_bpe_tokens",
        _r6(F.col("avg_token_len")).alias("avg_token_len"),
        _r6(F.col("alpha_ratio")).alias("alpha_ratio"),
        _r6(F.col("punct_ratio")).alias("punct_ratio"),
        _r6(F.col("stopword_ratio")).alias("stopword_ratio"),
    )
    lang = predict_lang(d, "text", "doc_id")
    fp = fingerprint(d, "text", "doc_id")
    gq = gopher_quality(d, "text", "doc_id")
    rep = gopher_repetition(dn, "text", "doc_id")
    return (
        q.join(lang, "doc_id")
        .join(fp, "doc_id")
        .join(gq, "doc_id")
        .join(rep, "doc_id")
        .join(contam, "doc_id")
    )




# ----------------------------------------------------------------------
# q2x — clustering metrics / similarity / CC
# ----------------------------------------------------------------------

def _clusterings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    true = emb.select(F.col("vec_id").alias("mention"), F.col("label").alias("cluster"))
    pred = emb.select(
        F.col("vec_id").alias("mention"), (F.col("vec_id") % 7).cast("int").alias("cluster")
    )
    return true, pred


def _metric_out(df):
    return df.select(
        _r6(F.col("p_num")).alias("p_num"),
        _r6(F.col("p_den")).alias("p_den"),
        _r6(F.col("r_num")).alias("r_num"),
        _r6(F.col("r_den")).alias("r_den"),
        _r6(F.col("precision")).alias("precision"),
        _r6(F.col("recall")).alias("recall"),
        _r6(F.col("fscore")).alias("fscore"),
    )


def q21_cluster_metrics(spark, sf_dir):
    """Clustering-metric lattice in one frame: pairwise (A5 — THE
    acceptance metric, coref_metrics.py:605-611), B³ (A7), MUC (A8),
    and BLANC negative-pair agreement (A6, coref_metrics.py:574-598),
    one row per metric.

    (r6) Computed via ``cluster_metrics_bundle``: the four independent
    metric plans re-derived the same normalize/join/size aggregates —
    122 Exchanges and 56 scans — where one shared contingency table
    suffices (inputs are mention-unique: vec_id is the table key).
    Values are expression-identical to the four metric functions
    (parity pytest + the unchanged per-metric oracle)."""
    from medtype_spark.metrics.clustering import cluster_metrics_bundle

    true, pred = _clusterings(spark, sf_dir)
    out = cluster_metrics_bundle(true, pred)
    return out.select(
        "metric",
        _r6(F.col("p_num")).alias("p_num"),
        _r6(F.col("p_den")).alias("p_den"),
        _r6(F.col("r_num")).alias("r_num"),
        _r6(F.col("r_den")).alias("r_den"),
        _r6(F.col("precision")).alias("precision"),
        _r6(F.col("recall")).alias("recall"),
        _r6(F.col("fscore")).alias("fscore"),
    )


def q24_cosine_topk(spark, sf_dir):
    """Brute-force ANN baseline: top-5 cosine neighbours of 10 queries.

    (r6) fan_out on the corpus side: the single-row-group test file
    scans as ONE partition, so the entire queries×corpus scoring ran in
    one task; a cheap repartition spreads the dot products across the
    cluster (no-op on real multi-split scans)."""
    from medtype_spark.session import fan_out

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(fan_out(emb), queries, k=5)
    return out.select("query_id", "rank", "vec_id")


def q25_cc_chains(spark, sf_dir):
    """Connected components on planted chain graphs (CC worst case)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id")
    edges = emb.where(F.col("vec_id") % 10 != 9).select(
        F.col("vec_id").alias("src"), (F.col("vec_id") + 1).alias("dst")
    )
    return connected_components(
        edges, vertices=emb.select(F.col("vec_id").alias("node"))
    ).select("node", "component")


def q26_salted_pair_counts(spark, sf_dir):
    """Salted block pair generation — count parity with n*(n-1)/2."""
    d = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("block_key"), F.col("doc_id").alias("mention_key")
    )
    pairs = block_pairs(d, hot_threshold=50, target_cell=20)
    return pairs.groupBy("block_key").agg(F.count(F.lit(1)).alias("n_pairs"))


def q27_interval_scores(spark, sf_dir):
    """J7 overlap scoring, BOTH modes on one matched set: 'max'
    (best single overlap) and 'sum' (union-coalesced covered chars /
    ref length, annotation.py:462-505) per ref span."""
    from medtype_spark.operators.intervals import overlap_score_sum

    e = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        (F.col("event_id") % 1000).alias("start"),
        (F.col("event_id") % 1000 + (F.floor("value").cast("long") % 50)).alias("end"),
    )
    left = e.where(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("ref_id"), "start", "end"
    )
    right = e.select("user_id", F.col("event_id").alias("sys_id"), "start", "end")
    matched = interval_join(left, right, band_key="user_id").where(
        F.col("ref_id") != F.col("sys_id_r")
    )
    mx = overlap_score_max(matched, ["ref_id"]).select(
        "ref_id", _r6(F.col("overlap")).alias("overlap_max")
    )
    sm = overlap_score_sum(matched, ["ref_id"]).select(
        "ref_id", _r6(F.col("overlap")).alias("overlap_sum")
    )
    return mx.join(sm, "ref_id")


def q28_first_mention(spark, sf_dir):
    """W3 is_first: first event per (user, type) in time order."""
    e = _t(spark, sf_dir, "events")
    marked = mark_first_mention(
        e, doc_col="user_id", eid_col="event_type", start_col="ts", end_col="event_id"
    )
    return marked.where(F.col("is_first")).select("user_id", "event_type", "event_id")


def q29_multi_id_match(spark, sf_dir):
    """J3 multi-valued OR-join + A1 contingency on an inline fixture.

    Gold ids are |-delimited (annotation.py:326-342 semantics: any
    split id matching counts the gold row once).
    """
    gold = spark.createDataFrame(
        [
            ("d1", 0, 5, "E1|E2"),
            ("d1", 10, 15, "E3"),
            ("d2", 0, 5, "E4|E5|E6"),
            ("d2", 8, 12, "E7"),
            ("d3", 1, 4, "E8"),
        ],
        ["docid", "start", "end", "eid"],
    )
    system = spark.createDataFrame(
        [
            ("d1", 0, 5, "E2"),
            ("d1", 10, 15, "E9"),
            ("d2", 0, 5, "E5"),
            ("d2", 8, 12, "E7"),
            ("d3", 2, 4, "E8"),
        ],
        ["docid", "start", "end", "eid"],
    )
    out = contingency_prf(
        gold, system, keys=["docid", "start", "end", "eid"], gold_multi_col="eid"
    )
    return out.select(
        "tp", "fp", "fn",
        _r6(F.col("precision")).alias("precision"),
        _r6(F.col("recall")).alias("recall"),
        _r6(F.col("fscore")).alias("fscore"),
    )


# ----------------------------------------------------------------------
# rows-only queries (no SQL oracle: iterative / hash-specific / stubbed)
# ----------------------------------------------------------------------

def q50_simhash(spark, sf_dir):
    """SimHash with the md5 hash family: bit votes, sign packing and
    all — reproduced bit-for-bit by the DuckDB oracle (the production
    default stays xxhash64; the plan shape is identical)."""
    from medtype_spark.session import fan_out

    return simhash64(
        fan_out(_t(spark, sf_dir, "documents")), "text", "doc_id",
        hash_family="md5",
    )


def q52_stub_type_scorer(spark, sf_dir):
    """Batched pandas-UDF type scoring (deterministic stub model;
    md5 trigram buckets × integer weights, so the DuckDB oracle
    recomputes the full prediction — features, logits, threshold,
    label set — independently)."""
    from medtype_spark.functions.scoring import stub_type_scorer_udf

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", stub_type_scorer_udf(F.col("text")).alias("pred_types")
    )
    return scored.select(
        "doc_id", F.size("pred_types").alias("n_types"),
        F.md5(F.concat_ws("|", "pred_types")).alias("types_md5"),
    )


def q53_flagship_linkage(spark, sf_dir):
    """Flagship ER pipeline on deterministic synthetic pages (the
    BASELINE input_hint table) — pairwise F1 row vs planted gold."""
    from medtype_spark.datagen.pages import build_lexicon, entity_types_df, synth_pages
    from medtype_spark.pipeline import evaluate_linkage, run_linkage

    # partitions=1 (r6, was 4): python tasks fork a fresh worker each
    # (session pins worker.reuse=false for the sandbox), so scan-stage
    # task count IS the fixed cost at this 2000-page fixture size —
    # fork+Arrow setup dwarfs the ~0.3s of actual python work, and the
    # A/B (median-of-5, same session) reads 4.43s @ 4 parts vs 2.80s
    # @ 1 part for the whole query.  Results are partition-invariant
    # (tested).  Real corpora get their partitioning from the input
    # layout, not this fixture constant.
    pages, gold = synth_pages(spark, 2000, n_entities=60, seed=42, partitions=1)
    lex = build_lexicon(60)
    etypes = entity_types_df(spark, 60)
    # cleanup=False + checkpoint of the 1-row EVAL result (not the
    # mention-grain cluster table): the final job computes clusters
    # from the persisted mentions/edges and folds evaluation into the
    # same action, saving one full materialization; caches are then
    # released here, so bench loops stay clean.
    result = run_linkage(pages, lex, etypes, hot_threshold=500, target_cell=200)
    row = _metric_out(evaluate_linkage(result["clusters"], gold)).localCheckpoint()
    for df in result["persisted_frames"]:
        df.unpersist()
    return row


# (the full ordered registry is assembled once at the bottom of this
# module — oracle-backed queries first, so every entry falls inside the
# driver's 50-query correctness window)


# ----------------------------------------------------------------------
# q3x — evaluation / serving operators (added with evaluation module)
# ----------------------------------------------------------------------

_ANN_SCHEMA = (
    "docid:string, start:long, end:long, "
    "candidates:array<struct<eid:string,score:double,type:string>>"
)


def _fixture_gold_sys(spark):
    gold = spark.createDataFrame(
        [
            ("d", 0, 1, [("E1", 1.0, "O")]),
            ("d", 2, 3, [("E1", 1.0, "O")]),
            ("d", 4, 5, [("E1", 1.0, "O")]),
            ("d", 8, 9, [("NIL1", 1.0, "O")]),
            ("d", 10, 11, [("E5", 1.0, "O")]),
            ("d", 12, 13, [("NIL2", 1.0, "O")]),
        ],
        _ANN_SCHEMA,
    )
    system = spark.createDataFrame(
        [
            ("d", 0, 1, [("E1", 0.9, "O")]),
            ("d", 2, 3, [("E2", 0.9, "O")]),
            ("d", 6, 7, [("E3", 0.9, "O")]),
            ("d", 8, 9, [("E4", 0.9, "O")]),
            ("d", 10, 11, [("NIL9", 0.9, "O")]),
            ("d", 12, 13, [("NIL3", 0.9, "O")]),
        ],
        _ANN_SCHEMA,
    )
    return gold, system


def q30_error_labels(spark, sf_dir):
    """J14 + A11: error classification + most_common summary
    (analyze.py:16-31, 75-78) on an inline fixture."""
    from medtype_spark.evaluation.annotations import classify_errors, error_summary

    gold, system = _fixture_gold_sys(spark)
    return error_summary(classify_errors(gold, system))


def q31_weak_projection(spark, sf_dir):
    """P10: char-level 'weak' projection (neleval/weak.py:17-21) over
    integer spans derived from events."""
    from medtype_spark.evaluation.annotations import weak_projection

    e = _t(spark, sf_dir, "events").where(F.col("user_id") < 10).select(
        F.col("user_id").cast("string").alias("docid"),
        (F.col("event_id") % 100).alias("start"),
        (F.col("event_id") % 100 + F.floor("value").cast("long") % 5).alias("end"),
        F.array(F.struct(
            F.col("event_type").alias("eid"),
            F.col("value").alias("score"),
            F.lit("O").alias("type"),
        )).alias("candidates"),
    )
    out = weak_projection(e)
    return out.groupBy("docid", "start").agg(F.count(F.lit(1)).alias("n"))


def q32_split_reassemble(spark, sf_dir):
    """S9+S10+W4 round-trip in one frame: ventilator micro-batch split
    (.../server/__init__.py:212-218) per-partial rows joined with the
    ordered sink reassembly + checksum (:353-393) of the same
    partials."""
    from medtype_spark.streaming.serving import reassemble_jobs, split_into_partials

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("job_id"),
        F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "").alias("texts"),
    )
    parts = split_into_partials(d, max_batch_size=4)
    per_partial = parts.select(
        "job_id", "partial_id", "n_partials", F.size("items").alias("n_items"),
        F.concat_ws(" ", "items").alias("items_str"),
    )
    rt = reassemble_jobs(parts.withColumnRenamed("items", "results")).select(
        "job_id", F.concat_ws(" ", "results").alias("text_rt"), "collected"
    )
    return per_partial.join(rt, "job_id")


def q35_first_on_category(spark, sf_dir):
    """J9: filter_on_cat oracle selection (eval_models.py:3-13)."""
    from medtype_spark.operators.lookups import first_on_category

    mentions = spark.createDataFrame(
        [
            ("m1", [("E1", 0.9), ("E2", 0.8), ("E3", 0.7)], ["Anatomy"]),
            ("m2", [("E2", 0.9), ("E1", 0.8)], ["Disorders"]),
            ("m3", [("E9", 0.9)], ["Anatomy"]),          # unknown eid → -1
            ("m4", [("E3", 0.9), ("E1", 0.2)], ["Finding"]),
        ],
        "mention_id:string, candidates:array<struct<eid:string,score:double>>, act_cat:array<string>",
    )
    etypes = spark.createDataFrame(
        [("E1", ["Anatomy"]), ("E2", ["Disorders"]), ("E3", ["Anatomy", "Finding"])],
        "eid:string, types:array<string>",
    )
    out = first_on_category(mentions, etypes)
    return out.select("mention_id", "selected_eid", "selected_idx")


def q36_weighted_match(spark, sf_dir):
    """J5: weighted match with broadcast weight table + exact-match
    default (annotation.py:359-379, configs.py:276-289)."""
    from medtype_spark.operators.lookups import weighted_match_score

    gold = spark.createDataFrame(
        [("d1", "TYA"), ("d2", "TYA"), ("d3", "TYB"), ("d4", "TYC")],
        "docid:string, type:string",
    )
    system = spark.createDataFrame(
        [("d1", "TYA"), ("d2", "TYB"), ("d3", "TYB2"), ("d4", "TYX")],
        "docid:string, type:string",
    )
    weights = spark.createDataFrame(
        [("TYA", "TYB", 0.5), ("TYB", "TYB2", 0.8)],
        "gold_type:string, sys_type:string, weight:double",
    )
    out = weighted_match_score(gold, system, ["docid"], weights=weights)
    return out.select("docid", "gold_type", "sys_type", _r6(F.col("weight")).alias("weight"))


def q37_lookup_fallback(spark, sf_dir):
    """J10: 3-way id-normalization lookup back-off
    (eval_models.py:15-19)."""
    from medtype_spark.operators.lookups import lookup_with_fallback

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    dim = spark.createDataFrame(
        [("en", "english"), ("pfx_de", "german"), ("fr", "french"),
         ("pfx_zh", "chinese")],
        "key:string, value:string",
    )
    out = lookup_with_fallback(
        d, dim,
        [F.col("lang"), F.concat(F.lit("pfx_"), F.col("lang"))],
        out_col="lang_name",
    )
    return out.select("doc_id", "lang", "lang_name")


def q38_ceaf(spark, sf_dir):
    """A9 both CEAF variants via component-decomposed Hungarian
    (driver-side solve; no SQL oracle — the assignment problem is not
    expressible): mention-CEAF (φ3) and entity-CEAF (φ4, Dice), one
    row each.  The hash-pinnable fixture variant is
    q65_ceaf_fixture."""
    from medtype_spark.metrics.ceaf import entity_ceaf, mention_ceaf

    true, pred = _clusterings(spark, sf_dir)
    m = _metric_out(mention_ceaf(true, pred)).select(
        F.lit("mention_ceaf").alias("variant"), "*"
    )
    e = _metric_out(entity_ceaf(true, pred)).select(
        F.lit("entity_ceaf").alias("variant"), "*"
    )
    return m.unionByName(e)


def q40_server_stats(spark, sf_dir):
    """A12+A13 merged driver row: per-client request statistics
    (ServerStatistic analogue, .../server/__init__.py:605-673) union
    the message-size histogram — exact groupBy replacing the
    LRU-capped dict (server/helper.py:181-259; formerly q41, merged to
    keep the registry inside the driver's 50-query window) union the
    WATERMARKED STREAMING variant run on a real micro-batch stream
    over a deterministic 4-batch fixture (kind='window'; one late row
    dropped by the watermark, append mode emits only finalized
    windows — the oracle replays the operative-watermark protocol from
    scratch in SQL).  Common schema (kind, key, n, avg_msg_size,
    first_seen, last_seen); the key stays DOUBLE to avoid
    engine-dependent float→string formatting."""
    from medtype_spark.metrics.statistics import request_stats, size_histogram
    from medtype_spark.streaming.serving import windowed_stats_fixture_run

    ev = _t(spark, sf_dir, "events")
    clients = request_stats(ev).select(
        F.lit("client").alias("kind"),
        F.col("user_id").cast("double").alias("key"),
        F.col("n_requests").alias("n"),
        "avg_msg_size", "first_seen", "last_seen",
    )
    # sentinels, not NULLs, for the histogram arm: nullable timestamp/
    # double columns round-trip as NaT/NaN with engine-dependent reprs
    # under the driver's strict value-hash; the kind column
    # disambiguates.
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp")
    hist = size_histogram(ev).select(
        F.lit("bucket").alias("kind"),
        F.col("bucket_lo").cast("double").alias("key"),
        F.col("n"),
        F.lit(0.0).alias("avg_msg_size"),
        epoch.alias("first_seen"),
        epoch.alias("last_seen"),
    )
    win = windowed_stats_fixture_run(spark).select(
        F.lit("window").alias("kind"),
        F.col("user_id").cast("double").alias("key"),
        F.col("n_requests").alias("n"),
        "avg_msg_size",
        F.col("window_start").alias("first_seen"),
        (F.col("window_start") + F.expr("INTERVAL 10 MINUTES")).alias("last_seen"),
    )
    return clients.unionByName(hist).unionByName(win)


def q42_average_precision(spark, sf_dir):
    """A10: AUPRC, sort-based (medtype.py:236-252)."""
    from medtype_spark.metrics.ap import average_precision

    emb = _t(spark, sf_dir, "embeddings")
    scored = emb.select(
        F.col("vec_id"),
        (F.element_at("embedding", 1)).cast("double").alias("score"),
        (F.col("label") < 5).cast("int").alias("label"),
    )
    out = average_precision(scored, tiebreak_col="vec_id")
    return out.select(
        _r6(F.col("average_precision")).alias("average_precision"), "n_pos", "n"
    )


def q44_lsh_candidates(spark, sf_dir):
    """MinHash-LSH banding → candidate pairs: the equi-join-on-band
    path that replaces all-pairs at scale (dedup/minhash.py:65).  The
    md5 hash family is reproducible in DuckDB, so the full
    shingle→signature→band→bucket-join chain is oracle-checked.

    (r6) signatures via the row-local form (min over the doc's own
    shingle array — no explode/groupBy; bit-identical, pytest)."""
    from medtype_spark.dedup.minhash import minhash_signatures_local

    d = _t(spark, sf_dir, "documents")
    sig = minhash_signatures_local(d, "text", "doc_id", n=3, num_hashes=8)
    return lsh_candidate_pairs(sig, "doc_id", bands=4)


def q45_filter_candidates(spark, sf_dir):
    """J8 MedType candidate filter with both fallbacks on an inline
    fixture (.../server/__init__.py:524-544 semantics)."""
    from medtype_spark.operators.typefilter import filter_candidates

    mentions = spark.createDataFrame(
        [
            # types intersect → keep only E1
            ("m1", [("E1", 0.9), ("E2", 0.8)], ["Anatomy"]),
            # empty prediction → keep original list
            ("m2", [("E1", 0.9), ("E2", 0.8)], []),
            # no candidate survives → fall back to original list
            ("m3", [("E2", 0.9)], ["Anatomy"]),
            # unknown eid (not in dimension) → dropped unless fallback
            ("m4", [("E9", 0.9), ("E2", 0.8)], ["Disorders"]),
        ],
        "mention_id:string, candidates:array<struct<eid:string,score:double>>, pred_type:array<string>",
    )
    etypes = spark.createDataFrame(
        [("E1", ["Anatomy"]), ("E2", ["Disorders"])],
        "eid:string, types:array<string>",
    )
    out = filter_candidates(mentions, etypes)
    # string output (not array) so the value hash is engine-portable
    return out.select(
        "mention_id",
        F.concat_ws(
            "|", F.transform("filtered_candidates", lambda c: c["eid"])
        ).alias("kept_eids"),
    )


def _measure_frames(spark, sf_dir):
    """Deterministic gold/system annotation frames derived from events
    (same span derivation as q27/q39) for measure-registry queries."""
    e = _t(spark, sf_dir, "events")
    span = [
        F.col("user_id").cast("string").alias("docid"),
        (F.col("event_id") % 1000).alias("start"),
        (F.col("event_id") % 1000 + F.floor("value").cast("long") % 50).alias("end"),
    ]

    def cands(eid_col):
        return F.array(F.struct(
            eid_col.alias("eid"), F.lit(1.0).alias("score"), F.lit("O").alias("type"),
        )).alias("candidates")

    g_eid = F.when(
        F.col("event_id") % 5 == 0,
        F.concat(F.lit("E"), (F.col("event_id") % 37).cast("string"),
                 F.lit("|E"), (F.col("event_id") % 41).cast("string")),
    ).otherwise(F.concat(F.lit("E"), (F.col("event_id") % 37).cast("string")))
    gold = e.where(F.col("event_type") == "error").select(*span, cands(g_eid))

    s_eid = F.concat(
        F.lit("E"),
        ((F.col("event_id") % 37) + (F.col("event_id") % 7 == 0).cast("long")).cast("string"),
    )
    system = e.where(F.col("event_id") % 3 == 0).select(*span, cands(s_eid))
    return gold, system


def _measure_out(df):
    return df.select(
        _r6(F.col("p_num")).alias("p_num"), _r6(F.col("p_den")).alias("p_den"),
        _r6(F.col("r_num")).alias("r_num"), _r6(F.col("r_den")).alias("r_den"),
        _r6(F.col("precision")).alias("precision"),
        _r6(F.col("recall")).alias("recall"),
        _r6(F.col("fscore")).alias("fscore"),
    )


def q46_measures(spark, sf_dir):
    """Measure-spec mini-language, three registry entries in one frame
    (one row per spec): strong_all_match = sets::span+kbid (the
    trainer's default, eval_models.py:83, configs.py:145), sets::kbid
    (document-collection id sets), and overlap-maxmax::span+kbid
    (partial-overlap credit, annotation.py:462-516)."""
    from medtype_spark.evaluation.measures import evaluate_measure

    gold, system = _measure_frames(spark, sf_dir)
    out = None
    for spec in ["strong_all_match", "sets::kbid", "overlap-maxmax::span+kbid"]:
        row = _measure_out(evaluate_measure(gold, system, spec)).select(
            F.lit(spec).alias("measure"), "*"
        )
        out = row if out is None else out.unionByName(row)
    return out


def q49_tac_scan(spark, sf_dir):
    """S6: TAC XML+tab scan on the reference's own golden example files;
    the oracle reads the reference's pre-combined TSV — so parse parity
    is driver-checked, mirroring neleval/test.py:41-47."""
    from medtype_spark.sources.tac import prepare_tac

    got = prepare_tac(
        spark,
        "/root/repo/tests/fixtures/tac_gold.tab",
        "/root/repo/tests/fixtures/tac_gold.xml",
    )
    top = F.try_element_at("candidates", F.lit(1))
    return got.select(
        "docid", "start", "end",
        top["eid"].alias("eid"),
        top["score"].alias("score"),
        top["type"].alias("type"),
    )


def q54_type_remap(spark, sf_dir):
    """J11: 127-fine → 24-coarse → id remap chain over deterministic
    per-document label pairs (medtype.py:29-31,41,50)."""
    from medtype_spark.functions.typemap import (
        coarse_type_col,
        load_type_remap,
        remap_type_col,
    )

    fine = sorted(load_type_remap())
    arr = F.array(*[F.lit(x) for x in fine])
    d = _t(spark, sf_dir, "documents")
    labs = F.array(
        F.element_at(arr, (F.col("doc_id") % 127 + 1).cast("int")),
        F.element_at(arr, ((F.col("doc_id") * 7 + 3) % 127 + 1).cast("int")),
    )
    base = d.select("doc_id", labs.alias("labels"))
    return base.select(
        "doc_id",
        F.concat_ws(",", remap_type_col(F.col("labels"))).alias("label_ids"),
        F.concat_ws(",", coarse_type_col(F.col("labels"))).alias("coarse"),
    )


def q57_media_decode(spark, sf_dir):
    """Multimodal, merged driver row: opaque-binary media table →
    Arrow-batched decode stats + fixed-width features, PLUS the
    uniform k-frame sampling plan for video rows (formerly q58, merged
    to keep the registry inside the driver's 50-query window).  The
    stub decode is an md5 counter stream, so the DuckDB oracle
    regenerates the decoded signal and its statistics exactly (real
    codecs remain the documented swap-in boundary); frame selection is
    pure JVM metadata arithmetic — payloads untouched."""
    from medtype_spark.multimodal.media import (
        decode_stats,
        extract_media_features,
        sample_frame_indices,
        synth_media,
    )

    media = synth_media(spark, _t(spark, sf_dir, "documents"))
    stats = decode_stats(media)
    feats = extract_media_features(media).select(
        "media_id", F.size("features").alias("n_features")
    )
    frames = sample_frame_indices(media, k=4).select(
        "media_id", "n_frames",
        F.concat_ws(
            ",", F.transform("frame_indices", lambda i: i.cast("string"))
        ).alias("frames"),
    )
    # sentinels (0 / '') instead of NULLs for non-video rows: nullable
    # ints round-trip as float64 on one engine and Int32 on the other
    # under the strict value-hash.
    return (
        stats.join(feats, "media_id")
        .join(frames, "media_id", "left")
        .select(
            "media_id", "media_type", "sig_mean", "sig_std", "n_bytes",
            "n_features",
            F.coalesce("n_frames", F.lit(0)).alias("n_frames"),
            F.coalesce("frames", F.lit("")).alias("frames"),
        )
    )


def q60_neardup_clusters(spark, sf_dir):
    """Composed near-dup pipeline: minhash → LSH banding → Jaccard
    verify → transitive closure (rows-only: transitive closure is
    iterative; stages are oracle-checked individually via
    q14/q15/q16/q44)."""
    from medtype_spark.dedup.neardup import near_dup_clusters

    d = _t(spark, sf_dir, "documents")
    return near_dup_clusters(d, min_jaccard=0.8).select(
        "doc_id", "neardup_group", "group_size"
    )


def q61_lsh_cosine_pairs(spark, sf_dir):
    """Multi-table LSH cosine near-dup pairs — the scale path (salted
    within-bucket pair generation; the exact brute-force baseline
    lives in tests/test_knn.py's recall check).  md5-derived literal
    hyperplanes make bucket assignment engine-portable, so the DuckDB
    oracle recomputes planes, sign bits, bucket joins, and cosines
    from scratch."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    from medtype_spark.similarity.knn import lsh_cosine_pairs

    return lsh_cosine_pairs(emb, dim=64, min_cosine=0.35, n_planes=6, n_tables=3).select(
        "a", "b", _r6(F.col("cosine")).alias("cosine")
    )


def q62_embedding_candidates(spark, sf_dir):
    """M1: ScispaCy-style char-3gram embedding kNN candidate generation
    per distinct form.  md5 trigram buckets + exact-integer dots make
    the cosine ranking bit-portable, so the DuckDB oracle re-runs the
    whole retrieval (featurize both sides, rank, dedup-by-eid, top-k)
    from scratch."""
    from medtype_spark.datagen.pages import build_lexicon
    from medtype_spark.similarity.candidates import embedding_candidates

    d = _t(spark, sf_dir, "documents").select(
        F.lower(F.col("source")).alias("norm_form")
    ).dropDuplicates()
    out = embedding_candidates(d, build_lexicon(40), k=3)
    return out.select(
        "norm_form",
        F.size("emb_candidates").alias("n_cands"),
        F.try_element_at("emb_candidates", F.lit(1))["eid"].alias("top_eid"),
    )


def q55_token_batches(spark, sf_dir):
    """P4+W5+P8 end-to-end, per-mention grain: token-window assembly →
    length-sorted padded batches → mask-aware batched scoring →
    explode back to one row per mention (mention_key, men_pos,
    tok_len, 24-bit prediction string).  Per-mention output is
    partition-invariant (batch composition is not), and the md5
    tokenizer + integer-weight scorer make every column reproducible
    in DuckDB — the oracle recomputes windows, truncation arithmetic,
    token ids, and the per-class decision from scratch."""
    from medtype_spark.operators.batching import (
        assemble_token_windows,
        length_sorted_batches,
        score_batches,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("mention_key"), "text",
        F.lit(0).alias("start_offset"),
        F.least(F.length("text"), F.lit(12)).alias("end_offset"),
    )
    win = assemble_token_windows(d)
    batches = score_batches(length_sorted_batches(win, batch_size=16))
    per_mention = batches.select(
        F.explode(F.arrays_zip("keys", "men_pos", "tok_len", "probs")).alias("z")
    )
    bits = F.concat_ws(
        "",
        F.transform(
            F.col("z.probs"), lambda p: F.when(p > 0.5, F.lit("1")).otherwise(F.lit("0"))
        ),
    )
    return per_mention.select(
        F.col("z.keys").alias("mention_key"),
        F.col("z.men_pos").alias("men_pos"),
        F.col("z.tok_len").alias("tok_len"),
        bits.alias("pred_bits"),
    )


def q66_jw_scores(spark, sf_dir):
    """M2/flagship pairwise scorer: Jaro-Winkler over distinct
    source-form pairs, checked against DuckDB's NATIVE
    jaro_winkler_similarity — an independently-implemented JW, so this
    is a true differential test of the scorer the flagship links with.

    Scale + robustness guards (round-3 verdict items):
    - the pair domain is capped to the deterministic first 256 forms
      in lexicographic order (partition-parallel global rank, not a
      single-task sort), so the non-equi self-join stays fixture-sized
      at any sf;
    - pairs whose score sits within 1e-4 of a 5-digit rounding
      boundary are excluded ON BOTH SIDES: two independent double
      implementations can differ by an ulp, and a score exactly on a
      .5 boundary would flip the rounded digit.  The guard band (1e-4)
      is ~10 orders wider than any ulp divergence, so the kept-pair
      SET is identical across engines."""
    from medtype_spark.operators.pairs import jaro_winkler_udf
    from medtype_spark.operators.ranks import with_global_rank

    d = _t(spark, sf_dir, "documents").select(
        F.lower(F.col("source")).alias("form")
    ).dropDuplicates()
    capped = (
        with_global_rank(d, [F.asc("form")], rank_col="_rk")
        .where(F.col("_rk") <= 256)
        .select("form")
    )
    a = capped.select(F.col("form").alias("a"))
    b = capped.select(F.col("form").alias("b"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    jw = jaro_winkler_udf(F.col("a"), F.col("b"))
    scored = pairs.select("a", "b", jw.alias("_jw"))
    off_boundary = (
        F.abs(F.col("_jw") * 100000 - F.floor(F.col("_jw") * 100000) - 0.5) > 1e-4
    )
    return scored.where(off_boundary).select(
        "a", "b", F.round(F.col("_jw"), 5).alias("jw")
    )


def q63_brat_scan(spark, sf_dir):
    """S7: Brat standoff scan (neleval/brat.py:17-115) over committed
    fixture .ann files; the oracle reads the hand-verified expected
    TSV, so parse parity (kb-id namespace strip + unquote order,
    multi-normalization candidate order, no-candidate mentions) is
    driver-checked."""
    from medtype_spark.sources.brat import read_brat_dir

    got = read_brat_dir(spark, "/root/repo/tests/fixtures/brat")
    return got.select(
        "docid", "start", "end",
        F.concat_ws("|", F.transform("candidates", lambda c: c["eid"])).alias("eids"),
        F.size("candidates").alias("n_cands"),
    )


def q64_conll_scan(spark, sf_dir):
    """S8: CoNLL-2012-style coref bracket scan (coref_metrics.py:
    190-229) over committed fixture files (nested different-id spans,
    multi-piece tags, blank sentence breaks); oracle = hand-verified
    expected TSV."""
    from medtype_spark.sources.conll import read_conll_coref

    return read_conll_coref(spark, "/root/repo/tests/fixtures/conll/*.conll")


def q65_ceaf_fixture(spark, sf_dir):
    """A9 CEAF on the Luo (2005) example (gold {A:5,B:2,C:5} vs
    response {A:5,B:7}) — the published values the reference's own
    tests assert (test_coref_metrics.py:185-207).  The optimal
    alignment is known in closed form (A↔A, C↔B), so the DuckDB oracle
    recomputes every output from that alignment arithmetically —
    giving the otherwise SQL-inexpressible Hungarian path a
    hash-checked driver row."""
    from medtype_spark.metrics.ceaf import entity_ceaf, mention_ceaf

    gold = {"A": [1, 2, 3, 4, 5], "B": [6, 7], "C": [8, 9, 10, 11, 12]}
    resp = {"A": [1, 2, 3, 4, 5], "B": [6, 7, 8, 9, 10, 11, 12]}

    def df(clust):
        rows = [(str(m), c) for c, ms in clust.items() for m in ms]
        return spark.createDataFrame(rows, ["mention", "cluster"])

    m = _metric_out(mention_ceaf(df(gold), df(resp))).select(
        F.lit("mention_ceaf").alias("variant"), "*"
    )
    e = _metric_out(entity_ceaf(df(gold), df(resp))).select(
        F.lit("entity_ceaf").alias("variant"), "*"
    )
    return m.unionByName(e)


def q67_ivf_topk(spark, sf_dir):
    """IVF (inverted-file) ANN driver row: md5-derived integer
    centroids + integer-quantized embeddings → the REAL
    ivf_assign/ivf_topk pandas-UDF path (argmax cell assignment, probe
    lists, within-cell re-rank), metric='dot'.  Every decision is
    integer-exact (sums ≪ 2^53), so numpy's batched matmul, Spark's
    fold, and DuckDB's list_dot_product agree bit-for-bit and the
    oracle replays assignment, probing, and ranking from scratch.  The
    float/cosine production path keeps its recall pytest
    (test_neardup.py) against brute force."""
    from medtype_spark.similarity.knn import ivf_pq_topk, ivf_topk, md5_centroids

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000).cast("double"),
        ).alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") % 23 == 0)
    ivf = ivf_topk(
        emb,
        queries,
        dim=64,
        k=3,
        nprobe=2,
        query_id_col="vec_id",
        centroids=md5_centroids(64, 16, seed=7),
        metric="dot",
    ).select(
        F.lit("ivf").alias("kind"),
        "query_id", "rank", "vec_id",
        F.col("dot").cast("long").alias("score"),
    )
    # PQ arm: same coarse quantizer (shared cells/probes), ADC re-rank
    # over m=8 sub-space codes instead of the exact dot — the IVF-PQ
    # composition (`similarity/knn.py:ivf_pq_topk`), every LUT entry
    # and ADC sum an exact integer.
    pq = ivf_pq_topk(
        emb,
        queries,
        dim=64,
        k=3,
        nprobe=2,
        m=8,
        k_codes=16,
        query_id_col="vec_id",
        centroids=md5_centroids(64, 16, seed=7),
        seed=7,
    ).select(
        F.lit("pq").alias("kind"),
        "query_id", "rank", "vec_id",
        F.col("adc").cast("long").alias("score"),
    )
    # SemDedup arm (similarity/semdedup.py, Abbas et al. 2023): same
    # coarse quantizer, within-cell integer-dot edges at 350000,
    # CC closure, min-id canonical.  Column mapping into the shared
    # kind-frame: query_id=cell, rank=group_size, score=canonical_id.
    from medtype_spark.similarity.semdedup import semantic_dedup

    sd = semantic_dedup(
        emb,
        md5_centroids(64, 16, seed=7),
        threshold=350_000.0,
        metric="dot",
    ).select(
        F.lit("semdedup").alias("kind"),
        F.col("cell").cast("long").alias("query_id"),
        F.col("group_size").cast("int").alias("rank"),
        "vec_id",
        F.col("canonical_id").cast("long").alias("score"),
    )
    return ivf.unionByName(pq).unionByName(sd)


def q68_significance(spark, sf_dir):
    """R1+R2+R3 driver row: paired permutation p-value, bootstrap
    resampling, and exact-order-statistic percentile CIs over a
    deterministic per-doc contingency fixture (modular arithmetic on
    doc_id).  Trial randomness is md5-derived (hash_mode='md5'), so
    the DuckDB oracle replays every swap and resample decision
    bit-for-bit; fscore arithmetic is the same IEEE expression in both
    engines.  Production keeps xxhash64 + percentile_approx
    (significance.py) — this fixture pins the trial machinery."""
    from medtype_spark.metrics.significance import (
        bootstrap_diffs,
        percentile_ci_exact,
        permutation_test,
    )

    n_trials = 200
    d = F.col("doc_id")
    per_doc = (
        _t(spark, sf_dir, "documents")
        .where(d % 17 == 3)
        .select(
            d.alias("docid"),
            (d % 7).alias("tp1"), (d % 5).alias("fp1"), (d % 4).alias("fn1"),
            ((d + 3) % 7).alias("tp2"), ((d + 1) % 5).alias("fp2"),
            ((d + 2) % 4).alias("fn2"),
        )
    )
    perm = permutation_test(per_doc, n_trials=n_trials, seed=42, hash_mode="md5")
    boots = bootstrap_diffs(per_doc, n_trials=n_trials, seed=42, hash_mode="md5")
    ci = percentile_ci_exact(boots, n_trials)
    return ci.crossJoin(perm).select(
        "level",
        _r6(F.col("lo")).alias("lo"),
        _r6(F.col("hi")).alias("hi"),
        _r6(F.col("base_diff")).alias("base_diff"),
        _r6(F.col("p_value")).alias("p_value"),
        F.col("n_trials").cast("int").alias("n_trials"),
    )


def q69_select_alternatives(spark, sf_dir):
    """J12 + S3/S4/S5 driver row: the system annotation frame round-
    trips through the TSV sink and scan (write_annotation_tsv →
    read_annotation_tsv), then SelectAlternatives resolves a gold
    fixture exercising all four back-off tiers (span hit on the 2nd
    gold candidate, doc-level hit, collection-level hit, fallback to
    candidate 0) plus the single-candidate passthrough.  The oracle is
    the hand-derived expected selection per tier (prepare.py:8-104
    semantics)."""
    import shutil
    import tempfile

    from medtype_spark.evaluation.annotations import (
        ANNOTATION_SCHEMA,
        read_annotation_tsv,
        write_annotation_tsv,
    )
    from medtype_spark.evaluation.prepare import select_alternatives

    def cand(eid, score=1.0, typ="T"):
        return (eid, score, typ)

    system = spark.createDataFrame(
        [
            ("doc1", 0, 5, [cand("E1")]),
            ("doc1", 10, 15, [cand("E7")]),
            ("doc2", 0, 4, [cand("E9")]),
            ("doc3", 2, 6, [cand("E5")]),
        ],
        ANNOTATION_SCHEMA,
    )
    gold = spark.createDataFrame(
        [
            ("doc1", 0, 5, [cand("E3"), cand("E1", 0.9), cand("E2", 0.8)]),
            ("doc1", 20, 25, [cand("E7"), cand("E4", 0.9)]),
            ("doc2", 30, 34, [cand("E8"), cand("E5", 0.9)]),
            ("doc3", 10, 12, [cand("EX"), cand("EY", 0.9)]),
            ("doc2", 1, 2, [cand("E9")]),
        ],
        ANNOTATION_SCHEMA,
    )
    # roundtrip through the TSV sink+scan for real, then pin the rows
    # eagerly so the scratch dir can be removed before returning (the
    # lazy scan would otherwise hold a reference and repeated
    # bench/correctness runs would accumulate fixture directories)
    tmp = tempfile.mkdtemp(prefix="q69_tsv_")
    try:
        write_annotation_tsv(system, f"{tmp}/system")
        rt_rows = read_annotation_tsv(spark, f"{tmp}/system").collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    system_rt = spark.createDataFrame(rt_rows, ANNOTATION_SCHEMA)
    out = select_alternatives(gold, system_rt)
    return out.select(
        "docid", "start", "end",
        F.col("candidates")[0]["eid"].alias("sel_eid"),
        F.size("candidates").alias("n_cands"),
    )


# ----------------------------------------------------------------------
# Registry. The driver checks the FIRST 50 registered queries only, so
# the order is load-bearing: oracle-backed queries first, then the
# flagship, then the genuinely-iterative rows-only queries — 50 entries
# total, so every registered query gets a CORRECTNESS row.
# ----------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    fn.__name__: fn
    for fn in [
        # oracle-backed
        q01_pricing_summary,
        q03_top_order_per_cust,
        q04_cust_nation_stats,
        q05_order_fill_class,
        q06_semi_anti_join,
        q08_token_topk,
        q10_interval_overlap_counts,
        q11_sliding_stats,
        q12_micro_macro,
        q13_clean_text,
        q14_exact_dedup,
        q15_minhash,
        q16_ngram_jaccard,
        q17_textstats,
        q21_cluster_metrics,
        q24_cosine_topk,
        q25_cc_chains,
        q26_salted_pair_counts,
        q27_interval_scores,
        q28_first_mention,
        q29_multi_id_match,
        q30_error_labels,
        q31_weak_projection,
        q32_split_reassemble,
        q35_first_on_category,
        q36_weighted_match,
        q37_lookup_fallback,
        q40_server_stats,
        q42_average_precision,
        q44_lsh_candidates,
        q45_filter_candidates,
        q46_measures,
        q49_tac_scan,
        q50_simhash,
        q52_stub_type_scorer,
        q54_type_remap,
        q55_token_batches,
        q57_media_decode,
        q62_embedding_candidates,
        q63_brat_scan,
        q64_conll_scan,
        q65_ceaf_fixture,
        q60_neardup_clusters,
        q61_lsh_cosine_pairs,
        q66_jw_scores,
        q67_ivf_topk,
        q68_significance,
        q69_select_alternatives,
        # flagship (rows-only: synthetic-page datagen is not SQL)
        q53_flagship_linkage,
        # rows-only (assignment problem; hash-pinned via q65's fixture)
        q38_ceaf,
    ]
}
