"""Batched semantic-type scoring — the "transformer" pandas UDF contract.

The reference scores each mention in its context window with a BERT
multi-label head over 24 coarse types, sigmoid-thresholded at 0.5
(medtype-as-service/server/medtype_serving/server/__init__.py:506-522;
context assembly :480-504; threshold default server/helper.py:73).

At sandbox scale there is no torch, so the *model* is a deterministic
stub with the identical contract and the identical Spark-side plumbing:

- iterator-of-batches pandas UDF → "weights" are materialized once per
  executor worker (exactly where a real checkpoint load would go, cf.
  .../server/__init__.py:73-83), then reused across Arrow batches;
- input = (mention, left/right context window), output =
  array<string> of predicted coarse types;
- deterministic & partition-invariant: pure function of the input row,
  seeded with the trainer's seed 1234 (medtype-trainer/medtype.py:430),
  so results are identical at local[8] vs local[32] — required for the
  reproducible F1 acceptance.

The stub "model": hashing-trick character-trigram features → fixed
random linear head → sigmoid > 0.5.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# The 24 coarse semantic types of /root/reference/config/type2id.json.
COARSE_TYPES = [
    "Activities & Behaviors", "Anatomy", "Chemicals & Drugs",
    "Concepts & Ideas", "Devices", "Disease or Syndrome", "Disorders",
    "Finding", "Functional Concept", "Genes & Molecular Sequences",
    "Living Beings", "Mental or Behavioral Dysfunction",
    "Neoplastic Process", "Objects", "Occupations", "Organic Chemical",
    "Organizations", "Pathologic Function", "Pharmacologic Substance",
    "Phenomena", "Physiology", "Procedures", "Qualitative Concept",
    "Sign or Symptom",
]

N_FEATURES = 1024
SEED = 1234  # medtype-trainer/medtype.py:430
THRESHOLD = 0.5  # server/helper.py:73
CONTEXT_LEN = 120  # server/helper.py:71


def _load_stub_weights() -> np.ndarray:
    """Stand-in for the BERT checkpoint load (__init__.py:73-83)."""
    rs = np.random.RandomState(SEED)
    return rs.normal(0, 1.0, size=(N_FEATURES, len(COARSE_TYPES))).astype(np.float64)


def _featurize(texts: pd.Series) -> np.ndarray:
    """Hashing-trick character-trigram bag features.

    Uses crc32, NOT Python ``hash`` — string hashing is salted per
    process, which would silently break partition-invariance.
    """
    out = np.zeros((len(texts), N_FEATURES), dtype=np.float64)
    for i, t in enumerate(texts.fillna("").str.lower()):
        for j in range(max(len(t) - 2, 1)):
            h = zlib.crc32(t[j : j + 3].encode("utf-8", "replace")) % N_FEATURES
            out[i, h] += 1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


@pandas_udf(ArrayType(StringType()))
def stub_type_scorer_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """mention+context string → predicted coarse-type set (array).

    Deterministic hash-feature linear "model"; weights built once per
    worker and reused across Arrow batches (the checkpoint-load slot).
    """
    w = _load_stub_weights()
    labels = np.array(COARSE_TYPES, dtype=object)
    for texts in batches:
        feats = _featurize(texts)
        logits = feats @ w
        probs = 1.0 / (1.0 + np.exp(-logits))
        mask = probs > THRESHOLD
        yield pd.Series([list(labels[m]) for m in mask])


def context_window(text: Column, start: Column, end: Column,
                   k: int = CONTEXT_LEN) -> Column:
    """±k//2-char context window around a mention span, JVM-side.

    Char-grain analogue of the reference's token windows
    (.../server/__init__.py:489-492: prev/next k//2 tokens).
    """
    half = k // 2
    left = F.substring(text, F.greatest(start - half + 1, F.lit(1)), F.least(start, F.lit(half)))
    mention = F.substring(text, start + 1, end - start)
    right = F.substring(text, end + 1, F.lit(half))
    return F.concat_ws(" ", left, mention, right)


def predict_types(
    mentions: DataFrame,
    text_col: str = "text",
    start_col: str = "start_offset",
    end_col: str = "end_offset",
    out_col: str = "pred_type",
) -> DataFrame:
    """Score each mention row in its context window (batched)."""
    ctx = context_window(F.col(text_col), F.col(start_col), F.col(end_col))
    return mentions.withColumn(out_col, stub_type_scorer_udf(ctx))
