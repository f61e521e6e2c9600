"""Structured Streaming ingest: miru's WAL sip-cursor loop, Spark-native.

miru readers consume the WAL incrementally via sip cursors — resumable
offsets advanced only after a durable index write
(miru-api/.../wal/MiruWALClient.java:68-76; the checkpoint-after-durable-
write ordering in miru-stream-plugins/.../fulltext/FullTextGatherer.java:
205-242). The Spark-native equivalents used here:

- WAL + sip cursor      → ``readStream`` file source + streaming checkpoint
                          (offsets live in ``checkpointLocation``)
- partition roll        → each micro-batch appends NEW index partitions
                          (pids continue from the manifest high-water mark)
- append-order docIDs   → docIDs continue from the last assigned id; within
                          a batch they are the (repo, path, commit) rank —
                          matching miru's insertion-ordered activity index
                          (MiruPartitionCursor.java:29-31)
- delta merge ("chits") → ``refresh()`` re-merges segments into the global
                          queryable index (miru merges delta indexes when
                          chits run out, MiruMergeChits.java:8-15)

Idempotency: Structured Streaming may replay a micro-batch after a crash;
``_BATCHES`` records batch_id → pid range (atomic write-then-rename), and a
replayed batch_id is skipped — the same contract as manifests for the batch
builder (exactly-once appends on top of at-least-once delivery).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from miru_spark.corpus import CORPUS_SCHEMA
from miru_spark.index.build import build_field_filters, build_segments, key_partition

_BATCHES = "stream_batches.json"


def _load_batches(index_dir: str) -> dict:
    p = os.path.join(index_dir, _BATCHES)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_batches(index_dir: str, batches: dict) -> None:
    p = os.path.join(index_dir, _BATCHES)
    tmp = p + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(batches, f)
    os.replace(tmp, p)


def _bases(index_dir: str) -> int:
    """Next pid from the manifest high-water mark. (docIDs need no base:
    segments store partition-local ids; the merge assigns global ids from
    manifest counts in pid order, which IS arrival order here.)"""
    man_dir = os.path.join(index_dir, "manifests")
    pid_base = 0
    if os.path.isdir(man_dir):
        for name in os.listdir(man_dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(man_dir, name)) as f:
                m = json.load(f)
            pid_base = max(pid_base, m["pid"] + 1)
    return pid_base


def append_batch(
    batch_df: DataFrame, batch_id: int, index_dir: str, partitions_per_batch: int = 4
) -> None:
    """Index one micro-batch as fresh partitions appended to the index."""
    batches = _load_batches(index_dir)
    if str(batch_id) in batches:
        return  # replayed batch — already durable, skip (sip-cursor semantics)
    if batch_df.isEmpty():
        return
    pid_base = _bases(index_dir)
    keyed = key_partition(batch_df, partitions_per_batch)
    shifted = keyed.withColumn("_pid", (F.col("_pid") + F.lit(pid_base)).cast("int"))
    manifests = build_segments(shifted, index_dir, resume=False).collect()
    batches[str(batch_id)] = {
        "pids": sorted(m["pid"] for m in manifests),
        "n_docs": sum(m["n_docs"] for m in manifests),
    }
    _save_batches(index_dir, batches)


def ingest_stream(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    partitions_per_batch: int = 4,
    available_now: bool = True,
):
    """Start the streaming build: parquet files arriving in ``source_dir``
    are tokenized and appended as index partitions. ``available_now=True``
    drains what's there and stops (the batch-incremental mode); False keeps
    a continuous stream. Returns the StreamingQuery."""
    os.makedirs(index_dir, exist_ok=True)
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(source_dir)
    writer = stream.writeStream.foreachBatch(
        lambda df, bid: append_batch(df, bid, index_dir, partitions_per_batch)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def refresh(spark: SparkSession, index_dir: str) -> dict:
    """Re-merge all segments into the queryable global index (the delta-merge
    analog). Call after a drain / periodically on a live stream."""
    from miru_spark.index.merge import merge_segments

    summary = merge_segments(spark, index_dir)  # also globalizes doc_meta
    build_field_filters(spark, index_dir)
    return summary
