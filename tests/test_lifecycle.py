"""Whole-lifecycle integration: stream many batches through the ingest-time
dedup filter, compact the small partitions, delete some docs, sync to a
replica, and verify both clusters answer rank-identically — the full
day-in-the-life of the engine in one test."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from miru_spark.corpus import generate_corpus
from miru_spark.index.compact import compact
from miru_spark.query.scorer import search_distributed, search_local
from miru_spark.streaming.ingest import append_batch, refresh
from miru_spark.sync import sync_index


@pytest.fixture(scope="module")
def lifecycle(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("lifecycle")
    index_dir = str(root / "idx")
    store = str(root / "dedup_store")
    os.makedirs(index_dir)
    full = generate_corpus(spark, n_rows=240, seed=77, partitions=1).persist()
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")

    # 6 batches of 40; batches 4-5 additionally REPLAY content of batches
    # 0-1 under new keys (exact dups the ingest filter must drop)
    for b in range(6):
        wave = full.filter((rowidx >= b * 40) & (rowidx < (b + 1) * 40))
        if b >= 4:
            dup_src = full.filter(
                (rowidx >= (b - 4) * 40) & (rowidx < (b - 4) * 40 + 10)
            ).withColumn("path", F.concat(F.col("path"), F.lit(f".dup{b}")))
            wave = wave.unionByName(dup_src)
        append_batch(wave, b, index_dir, partitions_per_batch=2, dedup_store=store)
    refresh(spark, index_dir)
    return index_dir, store, full


def test_dedup_dropped_cross_batch_replays(lifecycle, spark):
    index_dir, store, full = lifecycle
    import json

    with open(os.path.join(index_dir, "corpus_stats.json")) as f:
        n = json.load(f)["n_docs"]
    # every .dup copy must have been filtered: exactly the 240 originals
    assert n == 240


def test_compact_then_queries_still_match(lifecycle, spark):
    index_dir, store, full = lifecycle
    summary = compact(index_dir, target_docs=1000)
    assert summary["groups"] >= 1
    refresh(spark, index_dir)
    loc = search_local(index_dir, "merge AND sort", k=10)
    dist = search_distributed(spark, index_dir, "merge AND sort", k=10).toPandas()
    assert list(loc["doc_id"]) == list(dist["doc_id"])
    assert len(loc) > 0


def test_remove_sync_replica_rank_identity(lifecycle, spark, tmp_path):
    index_dir, store, full = lifecycle
    from miru_spark.index import removal

    base = search_local(index_dir, "merge OR sort", k=10)
    victims = [int(x) for x in base["doc_id"][:2]]
    removal.remove_docs(index_dir, victims, version=10**9)
    after = search_local(index_dir, "merge OR sort", k=10)
    assert not (set(after["doc_id"]) & set(victims))

    dst = str(tmp_path / "replica")
    sync_index(index_dir, dst)
    refresh(spark, dst)
    rep = search_local(dst, "merge OR sort", k=10)
    assert list(rep["doc_id"]) == list(after["doc_id"])
    assert [round(float(s), 6) for s in rep["score"]] == [
        round(float(s), 6) for s in after["score"]
    ]
    # second sync ships nothing (cursor semantics)
    assert sync_index(index_dir, dst)["shipped_pids"] == []
