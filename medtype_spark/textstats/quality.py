"""Text-analysis operators for training-data pipelines.

Language-ID (marker-word heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting.  All pure ``pyspark.sql.functions`` — JVM-side
whole-stage-codegen, no Python in the hot path; filters over these
columns push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A tiny per-language marker vocabulary (top function words).  The
# heuristic is a toy, but its *shape* — broadcast marker table + array
# intersection counts — is the scalable pattern.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "una"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column) -> Column:
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-ish regex tokens (JVM regexp_count)."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def quality_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features: lengths, ratios, stopword share."""
    toks = tokens(F.col(text_col))
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_alpha = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z]", ""))
    n_punct = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        bpe_token_count(F.col(text_col)).alias("n_bpe_tokens"),
        F.when(n_toks == 0, F.lit(0.0)).otherwise(n_chars / n_toks).alias("avg_token_len"),
        F.when(n_chars == 0, F.lit(0.0)).otherwise(n_alpha / n_chars).alias("alpha_ratio"),
        F.when(n_chars == 0, F.lit(0.0)).otherwise(n_punct / n_chars).alias("punct_ratio"),
        F.when(n_toks == 0, F.lit(0.0)).otherwise(n_stop / n_toks).alias("stopword_ratio"),
    )


def predict_lang(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits.

    Deterministic tie-break by language code; 'und' when no marker hits.
    """
    toks = F.transform(tokens(F.col(text_col)), lambda t: F.lower(t))
    scores = []
    for i, lang in enumerate(sorted(LANG_MARKERS)):
        marker_arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        # neg_idx: ties on hits resolve to the alphabetically-first lang
        scores.append(
            F.struct(
                hits.alias("hits"),
                F.lit(-i).alias("neg_idx"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    predicted = F.when(best["hits"] == 0, F.lit("und")).otherwise(best["lang"])
    return df.select(F.col(id_col), predicted.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased, whitespace-
    collapsed, punctuation-stripped text (portable across engines)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))
