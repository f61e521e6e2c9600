"""Watermarked streaming waveform (A8 on Structured Streaming): windows
emit once sealed by the watermark, in-threshold late events count, and
too-late events are dropped — asserted against exact batch counts."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from miru_spark.streaming.waveform import run_waveform_batches


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        [(i, ts, et, 1.0) for i, (ts, et) in enumerate(rows)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)


D = dt.datetime


def test_watermark_windows_and_late_data(spark, tmp_path):
    src = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # wave 1: days 1-2, plus the stream's max event time at day 10 so the
    # watermark (max - 2 days = day 8) seals days 1-2 immediately
    _write_events(
        spark,
        os.path.join(src, "w1"),
        [
            (D(2024, 1, 1, 10), "click"),
            (D(2024, 1, 1, 11), "click"),
            (D(2024, 1, 2, 9), "view"),
            (D(2024, 1, 10, 0), "tick"),
        ],
    )
    out = str(tmp_path / "out")
    q = run_waveform_batches(spark, os.path.join(src, "w*"), ckpt, out)
    q.awaitTermination(120)
    got = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # days 1-2 sealed (watermark = Jan 8); the day-10 window is still open
    assert got == {
        ("2024-01-01", "click"): 2,
        ("2024-01-02", "view"): 1,
    }

    # wave 2: a LATE event for day 1 (behind the Jan 8 watermark → dropped)
    # and one for day 9 (inside the threshold → counted), plus a tick at
    # day 12 that advances the watermark to day 10 — sealing day 9 (window
    # end Jan 10 <= watermark) but NOT day 10 (end Jan 11 is still ahead)
    _write_events(
        spark,
        os.path.join(src, "w2"),
        [
            (D(2024, 1, 1, 12), "click"),   # too late: silently dropped
            (D(2024, 1, 9, 8), "purchase"),  # in threshold: counts
            (D(2024, 1, 12, 0), "tick"),
        ],
    )
    q = run_waveform_batches(spark, os.path.join(src, "w*"), ckpt, out)
    q.awaitTermination(120)
    got2 = {
        (r["bucket"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # append-mode file sink: only NEWLY sealed windows were added — the
    # too-late day-1 click neither re-emitted nor recounted its window
    assert got2 == {**got, ("2024-01-09", "purchase"): 1}
