"""Streaming ingest: micro-batched corpus arrival → appended index
partitions → refresh → queries match the oracle; replayed batches are
idempotent (the WAL sip-cursor contract, MiruWALClient.java:68-76)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from miru_spark.corpus import generate_corpus
from miru_spark.index.build import assign_doc_ids
from miru_spark.query.oracle import oracle_topk
from miru_spark.query.scorer import search_local
from miru_spark.streaming.ingest import _bases, append_batch, ingest_stream, refresh


@pytest.fixture(scope="module")
def stream_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    source = str(root / "arrivals")
    index_dir = str(root / "idx")
    ckpt = str(root / "ckpt")
    os.makedirs(source)
    full = generate_corpus(spark, n_rows=150, seed=42, partitions=1).persist()
    # row index i is recoverable from the generator's path "src/d*/f{i}.ext"
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")
    for i, (lo, hi) in enumerate([(0, 50), (50, 100), (100, 150)]):
        wave = full.filter((rowidx >= lo) & (rowidx < hi))
        wave.coalesce(1).write.mode("overwrite").parquet(os.path.join(source, f"wave_{i}"))
        # drain after each wave: three separate micro-batches, resumed from
        # the same streaming checkpoint each time
        q = ingest_stream(spark, os.path.join(source, "wave_*"), index_dir, ckpt)
        q.awaitTermination(120)
    refresh(spark, index_dir)
    return index_dir, full


def test_stream_indexed_everything(stream_index, spark):
    index_dir, full = stream_index
    with open(os.path.join(index_dir, "corpus_stats.json")) as f:
        cs = json.load(f)
    assert cs["n_docs"] == 150
    with open(os.path.join(index_dir, "stream_batches.json")) as f:
        batches = json.load(f)
    assert sum(b["n_docs"] for b in batches.values()) == 150
    assert len(batches) >= 3


def test_stream_query_matches_oracle_scores(stream_index, spark):
    """docIDs are arrival-ordered (not global key rank), so compare by key:
    the (repo, path) → score map must match the batch oracle exactly."""
    index_dir, full = stream_index
    with_ids, _ = assign_doc_ids(full, 2)
    for q in ("merge AND sort", "def", "merge OR sort"):
        got = search_local(index_dir, q, k=200)
        exp = oracle_topk(with_ids, q, k=200).toPandas()
        gmap = {(r.repo, r.path): round(float(r.score), 6) for r in got.itertuples()}
        emap = {(r.repo, r.path): round(float(r.score), 6) for r in exp.itertuples()}
        assert gmap == emap


def test_replayed_batch_is_skipped(stream_index, spark):
    index_dir, full = stream_index
    before = _bases(index_dir)
    # replay an already-recorded batch_id with different data — must be a no-op
    append_batch(full.limit(10), 0, index_dir)
    assert _bases(index_dir) == before
