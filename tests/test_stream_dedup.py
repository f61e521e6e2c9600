"""Ingest-time near-dup filtering (streaming/dedup.py): novel-only
survivors, cross-batch store matching, intra-batch drop rule, replay
idempotency."""

from __future__ import annotations

import pytest

from miru_spark.streaming.dedup import filter_batch

SCHEMA = "repo string, path string, commit string, lang string, content string"

BASE = (
    "def merge_sort(arr): left = merge_sort(arr[:mid]); right ="
    " merge_sort(arr[mid:]); return merge(left, right) # stable sort kernel"
)
OTHER = (
    "class RingBuffer: push pop capacity wraparound index head tail"
    " overflow guard memory layout contiguous"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "dedup_store")


def _keys(df):
    return sorted((r["repo"], r["path"]) for r in df.select("repo", "path").collect())


def test_first_batch_keeps_novel_drops_intra_batch_dup(spark, store):
    rows = [
        ("r1", "a.py", "c1", "python", BASE),
        ("r1", "b.py", "c1", "python", BASE + " tail"),  # near-dup of a.py
        ("r1", "c.py", "c1", "python", OTHER),
    ]
    out = filter_batch(spark, _batch(spark, rows), store, batch_id=0)
    # a < b by key, so b drops against a; c is novel
    assert _keys(out) == [("r1", "a.py"), ("r1", "c.py")]


def test_second_batch_matches_store_across_batches(spark, store):
    filter_batch(
        spark,
        _batch(spark, [("r1", "a.py", "c1", "python", BASE)]),
        store,
        batch_id=0,
    )
    rows = [
        ("r2", "z.py", "c9", "python", BASE + " suffix"),  # near-dup of stored a.py
        ("r2", "y.py", "c9", "python", OTHER),
    ]
    out = filter_batch(spark, _batch(spark, rows), store, batch_id=1)
    assert _keys(out) == [("r2", "y.py")]


def test_exact_duplicate_always_drops(spark, store):
    filter_batch(
        spark,
        _batch(spark, [("r1", "a.py", "c1", "python", BASE)]),
        store,
        batch_id=0,
    )
    out = filter_batch(
        spark,
        _batch(spark, [("r1", "a.py", "c2", "python", BASE)]),  # same text, new commit
        store,
        batch_id=1,
    )
    assert out.count() == 0


def test_replay_is_idempotent(spark, store):
    rows = [
        ("r1", "a.py", "c1", "python", BASE),
        ("r1", "b.py", "c1", "python", BASE + " tail"),
    ]
    first = _keys(filter_batch(spark, _batch(spark, rows), store, batch_id=0))
    # replay the SAME batch id: identical survivors, store unchanged —
    # critically, a.py must NOT be dropped against its own stored fingerprint
    replay = _keys(filter_batch(spark, _batch(spark, rows), store, batch_id=0))
    assert replay == first == [("r1", "a.py")]
    nxt = filter_batch(
        spark,
        _batch(spark, [("r9", "n.py", "c1", "python", OTHER)]),
        store,
        batch_id=1,
    )
    assert _keys(nxt) == [("r9", "n.py")]


def test_unrelated_docs_all_survive(spark, store):
    rows = [
        ("r1", "a.py", "c1", "python", BASE),
        ("r1", "b.py", "c1", "python", OTHER),
        ("r1", "c.py", "c1", "go", "package main import fmt net http handler"),
    ]
    out = filter_batch(spark, _batch(spark, rows), store, batch_id=0)
    assert out.count() == 3


def test_ingest_with_dedup_store_indexes_only_novel(spark, tmp_path):
    """append_batch(dedup_store=...) composition: a doc repeated (near-
    verbatim) in a later batch is filtered before indexing, and a replay
    of that batch stays idempotent."""
    import json
    import os

    from miru_spark.streaming.ingest import append_batch, refresh

    index_dir = str(tmp_path / "idx")
    store = str(tmp_path / "store")
    os.makedirs(index_dir)
    b0 = _batch(
        spark,
        [
            ("r1", "a.py", "c1", "python", BASE),
            ("r1", "b.py", "c1", "python", OTHER),
        ],
    )
    append_batch(b0, 0, index_dir, partitions_per_batch=1, dedup_store=store)
    b1 = _batch(
        spark,
        [
            ("r2", "copy.py", "c2", "python", BASE + " end"),  # near-dup of a.py
            ("r2", "new.py", "c2", "go", "package main func handler(w, r)"),
        ],
    )
    append_batch(b1, 1, index_dir, partitions_per_batch=1, dedup_store=store)
    # replay batch 1 — no new docs, no new pids
    append_batch(b1, 1, index_dir, partitions_per_batch=1, dedup_store=store)
    refresh(spark, index_dir)
    with open(os.path.join(index_dir, "corpus_stats.json")) as f:
        assert json.load(f)["n_docs"] == 3  # a, b, new — copy filtered
    batches = json.load(open(os.path.join(index_dir, "stream_batches.json")))
    assert batches["1"]["n_docs"] == 1


def test_zero_token_docs_survive_and_replay(spark, store):
    """A doc whose content tokenizes to [] has no fingerprint — it must
    still survive (it cannot be a simhash near-dup) on both the first run
    and a replay (the store file is the replay survivor set)."""
    rows = [
        ("r1", "a.py", "c1", "python", BASE),
        ("r1", "empty.txt", "c1", "python", "!!! ??? ..."),  # tokenizes to []
    ]
    out = _keys(filter_batch(spark, _batch(spark, rows), store, batch_id=0))
    assert out == [("r1", "a.py"), ("r1", "empty.txt")]
    replay = _keys(filter_batch(spark, _batch(spark, rows), store, batch_id=0))
    assert replay == out
    # and the null fingerprint never poisons later store matching
    nxt = filter_batch(
        spark, _batch(spark, [("r2", "n.py", "c1", "go", OTHER)]), store, batch_id=1
    )
    assert _keys(nxt) == [("r2", "n.py")]


def test_crash_between_store_write_and_journal_recovers(spark, store):
    """Crash window: the store parquet landed but the journal record did
    not. The orphan file must be invisible to matching (a doc must not be
    deduped against its own crashed attempt) and the retry must overwrite
    it and produce the same survivors."""
    import json
    import os

    from miru_spark.streaming.dedup import _JOURNAL, _STORE

    rows = [
        ("r1", "a.py", "c1", "python", BASE),
        ("r1", "b.py", "c1", "python", BASE + " tail"),
    ]
    first = _keys(filter_batch(spark, _batch(spark, rows), store, batch_id=0))
    # simulate the crash: erase the journal record, leave the parquet orphan
    jp = os.path.join(store, _JOURNAL)
    with open(jp) as f:
        j = json.load(f)
    del j["0"]
    with open(jp, "w") as f:
        json.dump(j, f)
    assert os.path.exists(os.path.join(store, _STORE, "batch_0.parquet"))
    retry = _keys(filter_batch(spark, _batch(spark, rows), store, batch_id=0))
    assert retry == first == [("r1", "a.py")]
