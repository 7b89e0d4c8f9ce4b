"""Near-duplicate detection: shingling, MinHash, LSH banding, n-gram
Jaccard, and SimHash — all as declarative DataFrame plans.

Scale shape (the part that matters at 100 TB):
- shingle explode → minhash is a single groupBy(doc) with min() partial
  aggregation — no shuffle of raw shingles beyond the doc-keyed one;
- LSH banding turns all-pairs into an equi-join on (band, band_hash) —
  candidate pairs only, never the quadratic cross product;
- verification (exact Jaccard) runs only on LSH candidates.

Hashes are md5-based so the DuckDB oracle can reproduce them exactly
(both engines expose md5 over strings).
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(col, n: int = 3):
    """Array of n-word shingles from whitespace-tokenized text.

    Accepts a Column or a column NAME; the name form is lru_cached —
    the shingle tree costs dozens of py4j round-trips to construct,
    which dominated repeated query builds on this host (Columns are
    immutable plan fragments, safe to reuse across DataFrames)."""
    if isinstance(col, str):
        return _word_shingles_cached(col, n)
    return _word_shingles_build(col, n)


@lru_cache(maxsize=32)
def _word_shingles_cached(col_name: str, n: int):
    return _word_shingles_build(F.col(col_name), n)


def _word_shingles_build(col, n: int):
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3, distinct: bool = True) -> DataFrame:
    """(id, shingle) pairs, deduplicated by default.

    ``distinct=False`` skips the dedup SHUFFLE for consumers that are
    duplicate-insensitive — ``min()`` aggregation (minhash) gives the
    same signature either way, so the minhash path saves a full pass
    over the shingle stream."""
    out = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    return out.dropDuplicates([id_col, "shingle"]) if distinct else out


def minhash_signatures(
    shingles: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig: array<string>) — sig[i] = min(md5(i || ':' || shingle)).

    md5-as-hash-family keeps the signature portable across engines; a
    production swap-in would be xxhash64 with seed i (cheaper, JVM).

    The k mins are k ``min()`` aggregate columns in ONE groupBy — the
    shuffle moves one row per (doc, partial) instead of the ×k row
    blow-up an explode(sequence(0, k-1)) would cost, and map-side
    partial aggregation reduces each input partition to |docs| rows
    before the exchange.
    """
    aggs = [
        F.min(
            F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle")))
        ).alias(f"_mh{i}")
        for i in range(num_hashes)
    ]
    mins = shingles.groupBy(id_col).agg(*aggs)
    return mins.select(
        id_col,
        F.array(*[F.col(f"_mh{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_signatures_local(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig) computed ROW-LOCALLY — no explode, no shuffle (r6).

    sig[i] = array_min(transform(shingles, g -> md5(i || ':' || g))) is
    the same min-over-the-doc's-shingles as the explode+groupBy form
    (``min`` is duplicate-insensitive and md5 is the identical
    function), but the per-doc reduction happens inside one projection:
    the explode machinery, the hash aggregation and the doc-keyed
    exchange all disappear.  At 100 TB this is strictly better — the
    signature is a pure function of the document row, so the operator
    is embarrassingly parallel over the scan.  Equality with
    ``doc_shingles(distinct=False) |> minhash_signatures`` is
    pytest-asserted (tests/test_neardup.py)."""
    grams = word_shingles(text_col, n)
    base = df.select(F.col(id_col), grams.alias("_grams"))

    def _mh(i: int):
        return F.array_min(
            F.transform(
                F.col("_grams"),
                lambda g: F.md5(F.concat_ws(":", F.lit(str(i)), g)),
            )
        )

    return base.select(
        F.col(id_col),
        F.array(*[_mh(i) for i in range(num_hashes)]).alias("sig"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
) -> DataFrame:
    """Band the signature; equi-join on (band, band_hash) → candidate
    pairs (a < b), deduplicated across bands."""
    banded = signatures.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        "sig",
    ).select(
        id_col,
        "band",
        F.md5(
            F.concat_ws(
                "|",
                F.slice(
                    F.col("sig"),
                    F.col("band") * (F.size("sig") / F.lit(bands)).cast("int") + 1,
                    (F.size("sig") / F.lit(bands)).cast("int"),
                ),
            )
        ).alias("band_hash"),
    )
    a = banded.select(F.col(id_col).alias("a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates()
    )


def capped_candidate_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    df_cap: int = 50,
) -> DataFrame:
    """Candidate pairs from a document-frequency-capped shingle
    self-join: shingles appearing in more than ``df_cap`` documents are
    excluded from candidate *generation* (they are stop-phrases that
    turn the self-join into a hot-key quadratic — the exact bomb LSH
    banding exists to avoid), so per-shingle work is bounded by
    df_cap².  Jaccard *verification* downstream still uses ALL
    shingles, so scores stay exact; only pairs that share nothing but
    ultra-common shingles are missed — by construction those have
    intersection made of stop-phrases and near-zero Jaccard in any
    realistically sized corpus.  SQL-expressible, so the oracle can
    reproduce it exactly (unlike the minhash-LSH path, which is
    checked separately via the md5 hash family)."""
    dfreq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    rare = shingles.join(
        dfreq.where(F.col("_df") <= df_cap).select("shingle"), "shingle"
    )
    a = rare.select(F.col(id_col).alias("a"), "shingle")
    b = rare.select(F.col(id_col).alias("b"), "shingle")
    return (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates()
    )


def capped_jaccard_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    df_cap: int = 50,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over the df-capped shingle space, in ONE self-join.

    Shingles appearing in more than ``df_cap`` documents (stop-phrases)
    are excluded from BOTH the intersection and the union — the SpotSigs
    stopword-filtering semantics (Theobald et al., SIGIR 2008).  This
    buys two scale properties at once: candidate generation is bounded
    (per-shingle work ≤ df_cap²) AND the intersection count falls out of
    the generation join itself, so there is no join-back of candidate
    pairs against full posting lists (the quadratic×fan-out stage that
    dominates a generate-then-verify plan).
    """
    from pyspark.storagelevel import StorageLevel

    dfreq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    rare = shingles.join(
        dfreq.where(F.col("_df") <= df_cap).select("shingle"), "shingle"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    sizes = rare.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = rare.select(F.col(id_col).alias("a"), "shingle")
    b = rare.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b")), "b")
        .select(
            "a",
            "b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= min_jaccard)


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: |A∩B| / |A∪B|."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sa = shingles.select(F.col(id_col).alias("a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        candidates.join(sa, "a").join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("n_sh").alias("n_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("n_sh").alias("n_b")), "b")
        .select(
            "a",
            "b",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= min_jaccard)


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              n: int = 2, hash_family: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over word n-grams, JVM-side bit arithmetic.

    For each of 64 bit positions, sum +1/-1 votes of hash(shingle)
    bits weighted by shingle frequency; the sign vector packs into a
    long.  Near-dups differ in few bits (hamming distance ≤ k).

    ``hash_family``: "xxhash64" (production: one cheap 64-bit hash) or
    "md5" (oracle-portable: bit b = bit b%4 of md5 hex digit b//4,
    identical arithmetic in DuckDB — used by q50 so the full SimHash
    is driver-hash-checked; same plan shape, just a pricier hash).
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    if hash_family == "xxhash64":
        sh = sh.withColumn("h", F.xxhash64("shingle"))

        def bit(b):
            return F.expr(f"(h >> {b}) & 1") == 1
    elif hash_family == "md5":
        # parse each hex digit ONCE into an int array; the 64 bit
        # probes are then cheap shifts on array elements (16 instr
        # calls per shingle instead of 64)
        sh = sh.withColumn("h", F.md5("shingle")).withColumn(
            "dg",
            F.expr(
                "transform(sequence(1, 16), "
                "k -> instr('0123456789abcdef', substr(h, k, 1)) - 1)"
            ),
        )

        def bit(b):
            return F.expr(f"(shiftright(dg[{b // 4}], {b % 4}) & 1) = 1")
    else:
        raise ValueError(hash_family)
    # 64 vote sums as 64 aggregate columns in ONE groupBy — the old
    # explode(sequence(0,63)) multiplied shuffle rows ×64; this keeps
    # one row per doc and lets partial aggregation combine map-side.
    vote_aggs = [
        F.sum(F.when(bit(b), F.lit(1)).otherwise(F.lit(-1))).alias(f"_v{b}")
        for b in range(64)
    ]
    votes = sh.groupBy(id_col).agg(*vote_aggs)
    packed = None
    for b in range(64):
        term = F.when(F.col(f"_v{b}") > 0, F.expr(f"shiftleft(1L, {b})")).otherwise(
            F.lit(0).cast("long")
        )
        packed = term if packed is None else packed + term
    return votes.select(id_col, packed.alias("simhash"))
