"""Streaming analytics waveform: watermarked windowed counts over a live
event stream — miru's Analytics plugin (A8) on Structured Streaming.

miru's analytics answers "counts per time segment per constraint" against
an index that keeps absorbing the WAL (Analytics.java:57-201, segment
cardinalities over the time index). The streaming-native equivalent:

    readStream(events) → withWatermark(ts, late_threshold)
      → groupBy(window(ts, bucket), event_type).count()
      → sink (append mode)

Watermark semantics carry miru's WAL-ordering reality: events later than
``late_threshold`` behind the stream's max event-time are DROPPED from
their (closed) window, and a window only emits once the watermark passes
its end — the same "a partition seals once its time range is behind the
sip cursor" behavior the LAB time index gives batch miru.

State per key is one count — Spark's windowed-aggregation state store
handles eviction at the watermark; no custom state operator needed (the
custom-state path is ``streaming/unread.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STREAM_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def waveform_stream(
    spark: SparkSession,
    source_dir: str,
    bucket: str = "1 day",
    late_threshold: str = "2 days",
) -> DataFrame:
    """Streaming DataFrame: (window_start, event_type, n) with late events
    beyond ``late_threshold`` dropped at the watermark. Attach any sink via
    ``.writeStream`` (tests use a memory sink in append mode — append emits
    a window only once it can no longer change, the correctness contract)."""
    stream = spark.readStream.schema(STREAM_EVENT_SCHEMA).parquet(source_dir)
    return (
        stream.withWatermark("ts", late_threshold)
        .groupBy(F.window("ts", bucket).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("bucket"),
            "event_type",
            "n",
        )
    )


def run_waveform_batches(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    bucket: str = "1 day",
    late_threshold: str = "2 days",
):
    """Drain available data through the windowed aggregation into a parquet
    file sink (append mode — the fault-tolerant sink; a window lands
    exactly once, when the watermark seals it). Returns the StreamingQuery.
    Re-invoking with the same checkpoint resumes from the recorded offsets
    and never re-emits already-sealed windows."""
    wf = waveform_stream(spark, source_dir, bucket, late_threshold)
    return (
        wf.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
