"""Stateful streaming inbox/unread tracker vs a single-pass replay oracle,
including state survival across separate micro-batches (checkpointed roaring
state, the WAL-replay durability of miru's unread index)."""

import os

import numpy as np
import pandas as pd
import pytest

from miru_spark.streaming.unread import EVENT_SCHEMA, batch_oracle, track_unread


def _events(seed: int, n_users: int = 6, n_events: int = 400) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for ts in range(n_events):
        uid = int(rng.integers(0, n_users))
        kind = rng.choice(["deliver", "deliver", "deliver", "read", "unread", "mark_all_read"],
                          p=[0.4, 0.2, 0.1, 0.15, 0.1, 0.05])
        doc = int(rng.integers(0, 50))
        rows.append((uid, str(kind), doc, ts))
    return pd.DataFrame(rows, columns=["user_id", "event_type", "doc_id", "ts"])


@pytest.mark.parametrize("seed", [1, 2])
def test_stateful_unread_matches_oracle(spark, tmp_path, seed):
    events = _events(seed)
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    # two arrival waves split by ts — state must carry across micro-batches
    # (memory sink can't recover a checkpoint → foreachBatch parquet sink)
    for i, part in enumerate([events[events.ts < 200], events[events.ts >= 200]]):
        spark.createDataFrame(part, EVENT_SCHEMA).coalesce(1).write.parquet(f"{src}/wave_{i}")
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(f"{src}/wave_*")
        q = (
            track_unread(stream)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # last update per user == full-replay oracle
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values(["user_id", "last_ts"])
        .groupby("user_id")
        .tail(1)
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = batch_oracle(events)
    assert got["user_id"].tolist() == exp["user_id"].tolist()
    assert got["n_inbox"].tolist() == exp["n_inbox"].tolist()
    assert got["n_unread"].tolist() == exp["n_unread"].tolist()
