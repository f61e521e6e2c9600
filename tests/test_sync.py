"""S16 cross-cluster sync: cursor-based incremental segment shipping
(miru-sync analog). Replica answers identically, re-sync ships only new
partitions, interrupted syncs resume, removal log merges version-guarded."""

import json
import os

import pytest
from pyspark.sql import functions as F

from miru_spark.corpus import generate_corpus
from miru_spark.index import removal
from miru_spark.query.scorer import search_local
from miru_spark.streaming.ingest import append_batch, refresh
from miru_spark.sync import sync_index


@pytest.fixture(scope="module")
def src_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sync") / "src")
    os.makedirs(idx)
    corpus = generate_corpus(spark, n_rows=120, seed=11, partitions=1)
    append_batch(corpus, 0, idx, 3)
    refresh(spark, idx)
    return idx


def test_replica_answers_identically(spark, src_index, tmp_path):
    dst = str(tmp_path / "dst")
    s = sync_index(src_index, dst)
    assert len(s["shipped_pids"]) == 3 and not s["skipped_pids"]
    refresh(spark, dst)  # receiver indexes what arrived, as in miru-sync
    for q in ("merge AND sort", "merge OR sort", "def"):
        a = search_local(src_index, q, k=30)
        b = search_local(dst, q, k=30)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        assert a["score"].tolist() == b["score"].tolist(), q
    # idempotent: second pass ships nothing
    s2 = sync_index(src_index, dst)
    assert not s2["shipped_pids"] and len(s2["skipped_pids"]) == 3


def test_incremental_sync_ships_only_new_partitions(spark, src_index, tmp_path):
    dst = str(tmp_path / "dst2")
    sync_index(src_index, dst)
    # new arrivals on the source
    wave2 = generate_corpus(spark, n_rows=180, seed=11, partitions=1).filter(
        F.regexp_extract("path", r"f(\d+)\.", 1).cast("long") >= 120
    )
    append_batch(wave2, 1, src_index, 2)
    refresh(spark, src_index)
    s = sync_index(src_index, dst)
    assert len(s["shipped_pids"]) == 2 and len(s["skipped_pids"]) == 3
    refresh(spark, dst)
    a = search_local(src_index, "merge OR sort", k=50)
    b = search_local(dst, "merge OR sort", k=50)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_interrupted_sync_resumes(spark, src_index, tmp_path):
    dst = str(tmp_path / "dst3")
    s = sync_index(src_index, dst)
    # simulate a crash that lost the LAST cursor update: data + manifest
    # shipped but progress stale → re-ship is a harmless overwrite
    ppath = os.path.join(dst, "sync_progress.json")
    with open(ppath) as f:
        progress = json.load(f)
    dropped = sorted(progress)[-1]
    del progress[dropped]
    with open(ppath, "w") as f:
        json.dump(progress, f)
    s2 = sync_index(src_index, dst)
    assert s2["shipped_pids"] == [int(dropped)]
    refresh(spark, dst)
    assert search_local(dst, "def", k=5)["doc_id"].tolist() == search_local(
        src_index, "def", k=5
    )["doc_id"].tolist()


def test_removal_log_syncs_version_guarded(spark, src_index, tmp_path):
    dst = str(tmp_path / "dst4")
    sync_index(src_index, dst)
    refresh(spark, dst)
    victim = int(search_local(src_index, "merge OR sort", k=1)["doc_id"].iloc[0])
    removal.remove_docs(src_index, [victim], version=5)
    s = sync_index(src_index, dst)
    assert s["removal_ops"] == 1
    assert victim not in set(search_local(dst, "merge OR sort", k=50)["doc_id"])
    # a STALE removal on the replica can't resurrect/override: repair at a
    # newer version on the source wins after the next sync
    removal.repair_docs(src_index, [victim], version=6)
    sync_index(src_index, dst)
    assert victim in set(search_local(dst, "merge OR sort", k=50)["doc_id"])


def test_sync_after_source_compaction(spark, src_index, tmp_path):
    """Source compaction folds partitions; the next sync must ship the
    compacted partition AND retire the replica's stale ones — otherwise the
    replica double-counts the folded docs and shifts every later docID."""
    from miru_spark.index.compact import compact

    dst = str(tmp_path / "dst5")
    sync_index(src_index, dst)
    refresh(spark, dst)
    before = search_local(src_index, "merge OR sort", k=40)

    compact(src_index, target_docs=10_000)  # fold everything into one pid
    refresh(spark, src_index)
    s = sync_index(src_index, dst)
    assert s["shipped_pids"] and s["retired_pids"]
    refresh(spark, dst)
    a = search_local(src_index, "merge OR sort", k=40)
    b = search_local(dst, "merge OR sort", k=40)
    assert before["doc_id"].tolist() == a["doc_id"].tolist()  # compaction no-op
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["score"].tolist() == b["score"].tolist()
