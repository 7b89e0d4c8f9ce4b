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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(col, n: int = 3):
    """Array of n-word shingles from whitespace-tokenized text."""
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs."""
    return (
        df.select(F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def minhash_signatures(
    shingles: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig: array<string>) — sig[i] = min(md5(i || ':' || shingle)).

    md5-as-hash-family keeps the signature portable across engines; a
    production swap-in would be xxhash64 with seed i (cheaper, JVM).
    """
    per_hash = shingles.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("h"),
        "shingle",
    ).select(
        id_col,
        "h",
        F.md5(F.concat_ws(":", F.col("h").cast("string"), F.col("shingle"))).alias("hv"),
    )
    mins = per_hash.groupBy(id_col, "h").agg(F.min("hv").alias("mh"))
    return (
        mins.groupBy(id_col)
        .agg(F.transform(F.array_sort(F.collect_list(F.struct("h", "mh"))), lambda x: x["mh"]).alias("sig"))
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
              n: int = 2) -> DataFrame:
    """64-bit SimHash over word n-grams, JVM-side bit arithmetic.

    For each of 64 bit positions, sum +1/-1 votes of xxhash64(shingle)
    bits weighted by shingle frequency; the sign vector packs into a
    long.  Near-dups differ in few bits (hamming distance ≤ k).
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    ).withColumn("h", F.xxhash64("shingle"))
    bits = sh.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        "h",
    ).withColumn(
        "vote",
        F.when(F.expr("(h >> bit) & 1") == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1L, bit)")).otherwise(F.lit(0))
        ).alias("simhash")
    )
