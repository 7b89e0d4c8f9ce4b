"""Structured-Streaming restatement of the MedType serving path.

The reference serves requests through a ZMQ ventilator → workers → sink
topology (medtype-as-service/server/medtype_serving/server/__init__.py):

- jobs larger than ``max_batch_size`` split into ``job_id@i`` partials
  (:212-218, default 256 at server/helper.py:100);
- workers process partials independently (:546-602);
- the sink reassembles partials in order by ``partial_id``, tracking a
  size checksum, and publishes when complete (:353-393).

Spark-first restatement: an unbounded stream of (job_id, partial_id,
payload) micro-batches; per-job stateful reassembly via watermarked
aggregation; emit exactly when ``collected == declared total`` (the
checksum rule).  ``foreachBatch`` is the PUB sink analogue.

These are *plan builders* — they accept any streaming or batch
DataFrame with the right columns so tests can drive them with a file /
rate / memory source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BATCH_SIZE = 256  # server/helper.py:100


def split_into_partials(requests: DataFrame,
                        job_col: str = "job_id",
                        texts_col: str = "texts",
                        max_batch_size: int = MAX_BATCH_SIZE) -> DataFrame:
    """Ventilator analogue (:212-218): explode an oversized job into
    numbered partials of ≤ max_batch_size items each.

    requests: (job_id, texts: array<string>) →
    (job_id, partial_id, n_partials, items: array<string>).
    """
    # greatest(…, 1): an empty job still yields ONE empty partial, so
    # n_partials stays a truthful checksum and reassemble_jobs never
    # silently drops the job (F.sequence(0, -1) would otherwise emit a
    # phantom descending [0, -1] pair).
    n_parts = F.greatest(
        F.ceil(F.size(texts_col) / F.lit(max_batch_size)).cast("int"), F.lit(1)
    )
    out = requests.select(
        F.col(job_col),
        n_parts.alias("n_partials"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_parts - 1),
                lambda i: F.slice(F.col(texts_col), i * max_batch_size + 1, max_batch_size),
            )
        ).alias("partial_id", "items"),
    )
    return out


def reassemble_jobs(partials: DataFrame,
                    job_col: str = "job_id",
                    partial_col: str = "partial_id",
                    items_col: str = "results",
                    declared_col: str = "n_partials") -> DataFrame:
    """Sink analogue (:353-393): group partials per job, order by
    partial_id (ordered-insert :368-379), and keep only jobs whose
    partial count equals the declared checksum (:386-388).

    Works identically on a batch DataFrame or a streaming one inside
    ``foreachBatch`` (update-mode aggregation).
    """
    agg = partials.groupBy(job_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(partial_col, items_col))),
            lambda s: s[items_col],
        ).alias("ordered_results"),
        F.count(F.lit(1)).alias("collected"),
        F.first(declared_col).alias("declared"),
    )
    return agg.where(F.col("collected") == F.col("declared")).select(
        job_col,
        F.flatten("ordered_results").alias("results"),
        "collected",
    )


def windowed_request_stats(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming ServerStatistic (A12 analogue,
    .../server/__init__.py:605-673) as a watermarked windowed
    aggregation: per (client, event-time window) request counts and
    mean message size.  Late data beyond the watermark is dropped and
    state for closed windows is evicted — the property that keeps the
    aggregation's state bounded on an unbounded stream.  Works on a
    streaming OR batch frame (same plan; tests run both)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.avg("value").alias("avg_msg_size"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id", "n_requests",
            F.round("avg_msg_size", 6).alias("avg_msg_size"),
        )
    )


def streaming_reassembly_query(partial_stream: DataFrame, sink_fn,
                               checkpoint_dir: str):
    """Wire a partial stream into foreachBatch reassembly (PUB sink
    analogue).  Caller supplies ``sink_fn(batch_df, batch_id)``; late
    partials are handled by re-aggregating per micro-batch (the batch
    analogue of the reference's pending-job dict :288,343-350)."""

    def process(batch_df, batch_id):
        complete = reassemble_jobs(batch_df)
        sink_fn(complete, batch_id)

    return (
        partial_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
