"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode / feature / resize / frame-sample
operators.

Design for 100 TB: media payloads stay OPAQUE BINARY end-to-end —
Spark shuffles/stores them without interpretation, metadata lives in a
typed struct column so predicates on (media_type, width, duration…)
push down to the parquet scan without touching payload bytes, and all
per-payload computation is ``mapInPandas`` over bounded Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` caps worker memory
regardless of partition size).

The actual codecs (PIL / libav) are NOT in this container, so the
decode kernels are deterministic fakes behind ``_HAS_PIL``-style
guards, clearly marked: they produce stable pseudo-content from the
payload bytes so the Spark-side plumbing (schemas, batch shapes,
partitioning, joins over features) is real and testable.  Swapping in
a real codec changes ONLY the ``_decode_*_kernel`` bodies.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real decoder if ever present in the image
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

MEDIA_META = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),  # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])

N_MEDIA_FEATURES = 64


def synth_media(spark, documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table:
    payload = utf-8 text bytes (an opaque stand-in), typed metadata a
    pure function of doc_id.  Columnar, partition-invariant."""
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        F.element_at(
            F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("format"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 24).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 0, 3).otherwise(1).cast("int").alias("channels"),
        F.when(F.col("doc_id") % 3 == 1, 16000).otherwise(0).cast("int").alias("sample_rate"),
        F.when(F.col("doc_id") % 3 == 2, (F.col("doc_id") % 240 + 8))
        .otherwise(1).cast("int").alias("n_frames"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_pixels(payload: bytes, n: int = 256) -> np.ndarray:
    """Deterministic pseudo-decode: stable bytes → [0,1) floats.

    STUB standing in for a real image/audio decode (no codec libs in
    this container); same output for same payload on any partition.
    Sample i = md5(md5(payload) ':' i)[:8 hex] / 2^32 — a pure md5
    counter stream, so the DuckDB oracle for q57 reproduces the
    decoded signal (and its stats) exactly, unlike the previous
    np.RandomState stream which only Python could generate."""
    if not payload:
        return np.zeros(n)
    d = hashlib.md5(payload).hexdigest()
    return np.array([
        int(hashlib.md5(f"{d}:{i}".encode()).hexdigest()[:8], 16) / 4294967296.0
        for i in range(n)
    ])


def extract_media_features(media: DataFrame, out_col: str = "features") -> DataFrame:
    """Fixed-width feature vector per payload (the embed step of a
    training-data pipeline).  Arrow-batched; payload bytes never leave
    the worker as anything but the feature vector."""
    schema = T.StructType(
        [f for f in media.schema.fields if f.name != "payload"]
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            feats = [
                _fake_pixels(bytes(p) if p is not None else b"", N_MEDIA_FEATURES)
                .round(6).tolist()
                for p in pdf["payload"]
            ]
            out = pdf.drop(columns=["payload"]).copy()
            out[out_col] = feats
            yield out

    return media.mapInPandas(run, schema=schema)


def decode_stats(media: DataFrame) -> DataFrame:
    """Per-payload decode statistics (mean/std/min/max over the decoded
    signal) — the validate/filter step before training ingestion."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("sig_mean", T.DoubleType()),
        T.StructField("sig_std", T.DoubleType()),
        T.StructField("n_bytes", T.IntegerType()),
    ])

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for mid, mt, p in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                raw = bytes(p) if p is not None else b""
                sig = _fake_pixels(raw)
                rows.append((mid, mt, round(float(sig.mean()), 6),
                             round(float(sig.std()), 6), len(raw)))
            yield pd.DataFrame(
                rows, columns=["media_id", "media_type", "sig_mean", "sig_std", "n_bytes"]
            )

    return media.mapInPandas(run, schema=schema)


def _resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """One payload → resized payload bytes.

    With PIL present and a decodable image: real decode → resize →
    PNG re-encode.  Otherwise (no codec in this container, or opaque
    non-image bytes): deterministic stub — decode the md5 pseudo-signal
    on a 64×64 grid, nearest-neighbour resample to (height, width),
    quantize to uint8 raster bytes.  Either way the output is a REAL
    height×width payload, so downstream code (and tests) exercise the
    full decode→transform→re-encode shape; swapping in a codec changes
    only the PIL branch."""
    if _HAS_PIL:
        try:
            import io

            img = PIL.Image.open(io.BytesIO(payload))
            buf = io.BytesIO()
            img.resize((width, height)).save(buf, format="PNG")
            return buf.getvalue()
        except Exception:
            pass  # opaque/non-image bytes → stub resample below
    src = _fake_pixels(payload, 4096).reshape(64, 64)
    ys = np.minimum((np.arange(height) * 64) // max(height, 1), 63)
    xs = np.minimum((np.arange(width) * 64) // max(width, 1), 63)
    out = (src[np.ix_(ys, xs)] * 255.0).astype(np.uint8)
    return out.tobytes()


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads (Arrow-batched) and update metadata.

    Non-image rows pass through untouched; image rows get a real
    height×width payload from ``_resize_kernel`` plus the resized
    metadata, so dimension predicates stay pushdown-able."""

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = pdf.copy()
            is_img = out["media_type"] == "image"
            out.loc[is_img, "payload"] = [
                _resize_kernel(bytes(p) if p is not None else b"", width, height)
                for p in out.loc[is_img, "payload"]
            ]
            yield out

    resized = media.mapInPandas(run, schema=media.schema)
    return resized.withColumn(
        "meta",
        F.when(
            F.col("media_type") == "image",
            F.struct(
                F.col("meta.format").alias("format"),
                F.lit(width).cast("int").alias("width"),
                F.lit(height).cast("int").alias("height"),
                F.col("meta.channels").alias("channels"),
                F.col("meta.sample_rate").alias("sample_rate"),
                F.col("meta.n_frames").alias("n_frames"),
            ),
        ).otherwise(F.col("meta")),
    )


def resized_meta(media: DataFrame, width: int, height: int) -> DataFrame:
    """The shuffle-free metadata half of resize: predicates on the new
    dimensions stay pushdown-able; payload passes through opaque."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.channels").alias("channels"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )


def sample_frame_indices(media: DataFrame, k: int = 4) -> DataFrame:
    """Uniform k-frame sampling plan for video rows: pure JVM column
    arithmetic over metadata (idx_i = floor(i * n_frames / k), deduped
    ascending) — the selection is decided WITHOUT touching payloads,
    so a downstream decode only reads chosen frames."""
    n = F.col("meta.n_frames")
    idx = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.floor(i * n / k).cast("int"),
            )
        )
    )
    return media.where(F.col("media_type") == "video").select(
        "media_id", n.alias("n_frames"), idx.alias("frame_indices")
    )
