"""Inbox / unread tracking as a custom stateful streaming operator.

miru keeps per-streamId (per-user) Roaring bitmaps: an inbox index of
delivered docIDs and an unread index mutated by READ / UNREAD /
MARK_ALL_READ events (miru-plugin/.../index/MiruInboxIndex.java:12-47,
MiruUnreadTrackingIndex.java:12-30 — applyRead/applyUnread are bitmap
ANDNOT/OR; the JIT backfiller replays the WAL to rebuild state). The
Spark-native equivalent is ``applyInPandasWithState``: the per-user state IS
a serialized roaring bitmap (miru_spark.roaring) of unread docIDs plus the
inbox cardinality, mutated by event batches in timestamp order, checkpointed
by Structured Streaming (the WAL-replay durability story for free).

Event relation: (user_id long, event_type string, doc_id long, ts long)
  deliver       → doc joins the inbox and becomes unread
  read          → doc leaves the unread set (MiruUnreadTrackingIndex.applyRead)
  unread        → doc re-enters the unread set (applyUnread)
  mark_all_read → unread set cleared

The per-user event replay is a sequential state machine (order matters —
same as miru's WAL order); batches are vectorized per event-type run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from miru_spark import roaring

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("unread", T.BinaryType()),  # roaring bitmap of unread docIDs
        T.StructField("inbox", T.BinaryType()),   # roaring bitmap of delivered docIDs
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_inbox", T.LongType()),
        T.StructField("n_unread", T.LongType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def _replay(unread: set, inbox: set, pdf: pd.DataFrame) -> None:
    """Apply one user's events in ts order (stable for equal ts: input order)."""
    pdf = pdf.sort_values("ts", kind="mergesort")
    # vectorize runs of identical event types (the common deliver bursts)
    et = pdf["event_type"].to_numpy()
    docs = pdf["doc_id"].to_numpy()
    run_start = 0
    for i in range(1, len(pdf) + 1):
        if i == len(pdf) or et[i] != et[run_start]:
            kind = et[run_start]
            ds = docs[run_start:i]
            if kind == "deliver":
                inbox.update(ds.tolist())
                unread.update(ds.tolist())
            elif kind == "read":
                unread.difference_update(ds.tolist())
            elif kind == "unread":
                unread.update(d for d in ds.tolist() if d in inbox)
            elif kind == "mark_all_read":
                unread.clear()
            run_start = i


def _track(key, pdfs, state: GroupState):
    if state.exists:
        blob_u, blob_i = state.get
        unread = set(roaring.to_array(bytes(blob_u)).tolist())
        inbox = set(roaring.to_array(bytes(blob_i)).tolist())
    else:
        unread, inbox = set(), set()
    last_ts = 0
    for pdf in pdfs:
        if len(pdf):
            last_ts = max(last_ts, int(pdf["ts"].max()))
            _replay(unread, inbox, pdf)
    state.update(
        (
            roaring.from_array(np.array(sorted(unread), dtype=np.int64)),
            roaring.from_array(np.array(sorted(inbox), dtype=np.int64)),
        )
    )
    yield pd.DataFrame(
        [{"user_id": key[0], "n_inbox": len(inbox), "n_unread": len(unread), "last_ts": last_ts}]
    )


def track_unread(events: DataFrame) -> DataFrame:
    """events stream → per-user (n_inbox, n_unread) updates, stateful."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_oracle(events_pdf: pd.DataFrame) -> pd.DataFrame:
    """Replay everything in one pass (the JIT-backfillerizer analog) —
    the expected final state for tests."""
    out = []
    for uid, grp in events_pdf.sort_values("ts", kind="mergesort").groupby("user_id"):
        unread: set = set()
        inbox: set = set()
        _replay(unread, inbox, grp)
        out.append(
            {"user_id": int(uid), "n_inbox": len(inbox), "n_unread": len(unread),
             "last_ts": int(grp["ts"].max())}
        )
    return pd.DataFrame(out).sort_values("user_id").reset_index(drop=True)
