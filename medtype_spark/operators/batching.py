"""P4 token-window assembly + W5 length-sorted batching.

The reference's serving throughput trick is two-stage:

1. each mention becomes ``[CLS] + prev[-k/2:] + [MEN_START] + mention +
   [MEN_END] + next[:k/2] + [SEP]`` token ids with ``men_pos =
   len(prev)+1`` (.../server/__init__.py:489-498), truncated per
   dataloader.py:38-44 when over ``max_len``;
2. windows are sorted by descending length and chunked into batches of
   ``batch_size`` padded to the *batch* max (dataloader.py:59-67
   ``collate_fn``) — similar-length neighbours mean near-zero padding
   waste on the GPU.

Spark restatement: assembly is one Arrow-batched pandas UDF (the
tokenizer is a deterministic stub — crc32 ids over the same BPE-ish
regex as textstats — standing in for WordPiece, with the identical
window/truncation arithmetic).  Batching is ``sortWithinPartitions``
(a partition-local sort — NO global sort; padding efficiency only
needs neighbours to have similar lengths) followed by a mapInPandas
that chunks and pads.  One output row per batch keeps the matrix
shape the model UDF wants.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
VOCAB = 30000
CLS, SEP, MEN_START, MEN_END = 101, 102, 1, 2
CONTEXT_LEN = 120  # server/helper.py:71
MAX_LEN = 128


def _tok_ids(s: str) -> list[int]:
    """Deterministic stub WordPiece: md5 bucket per regex token
    (md5, not crc32, so the DuckDB oracle reproduces ids exactly)."""
    from medtype_spark.functions.scoring import md5_bucket

    return [md5_bucket(t, VOCAB) + 1000 for t in BPE_RE.findall(s)]


WINDOW_SCHEMA = T.StructType([
    T.StructField("toks", T.ArrayType(T.IntegerType())),
    T.StructField("men_pos", T.IntegerType()),
    T.StructField("tok_len", T.IntegerType()),
])


def assemble_window(text: str, start: int, end: int,
                    context_len: int = CONTEXT_LEN,
                    max_len: int = MAX_LEN) -> tuple[list[int], int, int] | None:
    """One window, reference arithmetic (__init__.py:489-498 +
    dataloader.py:38-46 truncation; None when untruncatable)."""
    half = context_len // 2
    mention = _tok_ids(text[start:end])
    prev = _tok_ids(text[:start])[-half:]
    nxt = _tok_ids(text[end:])[:half]
    if len(prev) + len(mention) + len(nxt) > max_len - 4:
        left_len = (max_len - len(mention) - 4) // 2
        if left_len < 0:
            return None
        prev = prev[-left_len:] if left_len else []
        nxt = nxt[:left_len]
    toks = [CLS] + prev + [MEN_START] + mention + [MEN_END] + nxt + [SEP]
    if len(toks) > max_len:
        return None
    return toks, len(prev) + 1, len(toks)


def assemble_token_windows(
    mentions: DataFrame,
    text_col: str = "text",
    start_col: str = "start_offset",
    end_col: str = "end_offset",
    context_len: int = CONTEXT_LEN,
    max_len: int = MAX_LEN,
    out_col: str = "window",
) -> DataFrame:
    """Append ``out_col`` struct(toks, men_pos, tok_len); rows whose
    window can't fit max_len get a null (reference returns None)."""

    @F.pandas_udf(WINDOW_SCHEMA)
    def _assemble(texts: pd.Series, starts: pd.Series, ends: pd.Series) -> pd.DataFrame:
        rows = [
            assemble_window(t or "", int(s), int(e), context_len, max_len)
            or (None, None, None)
            for t, s, e in zip(texts, starts, ends)
        ]
        return pd.DataFrame(rows, columns=["toks", "men_pos", "tok_len"])

    return mentions.withColumn(
        out_col, _assemble(F.col(text_col), F.col(start_col), F.col(end_col))
    )


BATCH_SCHEMA = T.StructType([
    T.StructField("keys", T.ArrayType(T.StringType())),
    T.StructField("tok_pad", T.ArrayType(T.ArrayType(T.IntegerType()))),
    T.StructField("tok_mask", T.ArrayType(T.ArrayType(T.DoubleType()))),
    T.StructField("men_pos", T.ArrayType(T.IntegerType())),
    T.StructField("tok_len", T.ArrayType(T.IntegerType())),
])


def length_sorted_batches(
    windows: DataFrame,
    key_col: str = "mention_key",
    window_col: str = "window",
    batch_size: int = 32,
) -> DataFrame:
    """collate_fn (dataloader.py:59-67): descending-length sort, chunk,
    pad to the batch max.  The sort is partition-local
    (sortWithinPartitions — no global shuffle-to-one-task); padding
    waste only needs neighbours of similar length, not a total order."""
    flat = windows.select(
        F.col(key_col).cast("string").alias("_key"),
        F.col(window_col)["toks"].alias("_toks"),
        F.col(window_col)["men_pos"].alias("_men_pos"),
        F.col(window_col)["tok_len"].alias("_tok_len"),
    ).where(F.col("_toks").isNotNull())
    flat = flat.sortWithinPartitions(F.desc("_tok_len"))

    def emit(chunk: pd.DataFrame):
        width = int(chunk["_tok_len"].max())
        pad, mask = [], []
        for toks in chunk["_toks"]:
            t = list(toks)
            pad.append(t + [0] * (width - len(t)))
            mask.append([1.0] * len(t) + [0.0] * (width - len(t)))
        return (
            list(chunk["_key"]), pad, mask,
            [int(x) for x in chunk["_men_pos"]],
            [int(x) for x in chunk["_tok_len"]],
        )

    def make_batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # rows arrive pre-sorted desc by tok_len (sortWithinPartitions),
        # so chunking streams with a < batch_size carry buffer — worker
        # memory stays O(arrow batch), never O(partition)
        carry: pd.DataFrame | None = None
        cols = ["keys", "tok_pad", "tok_mask", "men_pos", "tok_len"]
        for pdf in pdfs:
            part = pd.concat([carry, pdf], ignore_index=True) if carry is not None else pdf
            n_full = (len(part) // batch_size) * batch_size
            out = [emit(part.iloc[i:i + batch_size]) for i in range(0, n_full, batch_size)]
            carry = part.iloc[n_full:] if n_full < len(part) else None
            if out:
                yield pd.DataFrame(out, columns=cols)
        if carry is not None and len(carry):
            yield pd.DataFrame([emit(carry)], columns=cols)

    return flat.mapInPandas(make_batches, schema=BATCH_SCHEMA)


def padding_waste(batches: DataFrame) -> DataFrame:
    """Diagnostic: fraction of padded cells that are padding."""
    return batches.select(
        F.aggregate("tok_len", F.lit(0), lambda a, x: a + x).alias("_real"),
        (F.size("tok_pad") * F.size(F.element_at("tok_pad", 1))).alias("_cells"),
    ).agg(
        (1 - F.sum("_real") / F.sum("_cells")).alias("padding_waste"),
        F.count(F.lit(1)).alias("n_batches"),
    )


def score_batches(batches: DataFrame, out_col: str = "probs") -> DataFrame:
    """Batched stub scoring over padded token matrices — the slot where
    the transformer forward pass goes (__init__.py:506-522).  The stub
    is mask-aware (padding never changes a row's score), so batched and
    per-row scoring agree exactly — the property the parity test locks.
    """
    from medtype_spark.functions.scoring import COARSE_TYPES, _load_stub_weights

    out_schema = T.StructType(batches.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.ArrayType(T.DoubleType())))
    ])

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w = _load_stub_weights()  # checkpoint-load slot: once per worker
        n_feat = w.shape[0]
        for pdf in pdfs:
            probs_col = []
            for pad, mask in zip(pdf["tok_pad"], pdf["tok_mask"]):
                m = np.asarray([list(r) for r in pad], dtype=np.int64)
                msk = np.asarray([list(r) for r in mask], dtype=np.float64)
                feats = np.zeros((m.shape[0], n_feat))
                rows = np.repeat(np.arange(m.shape[0]), m.shape[1])
                np.add.at(feats, (rows, (m % n_feat).ravel()), msk.ravel())
                # integer counts × integer weights: the logit dot is
                # float-exact, so prob > 0.5 ⟺ dot > 0 is portable
                # (and mask-aware: padded cells contribute 0 counts)
                logits = feats @ w
                probs_col.append((1.0 / (1.0 + np.exp(-logits / 1000.0))).tolist())
            pdf = pdf.copy()
            pdf[out_col] = probs_col
            yield pdf

    return batches.mapInPandas(run, schema=out_schema)
