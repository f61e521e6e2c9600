"""Compaction (S13 delta-merge analog): streamed micro-batch segments are
rewritten into fewer partitions with IDENTICAL query results and global
docIDs (offsets derive from manifest counts in pid order, which compaction
preserves)."""

import os

import pytest
from pyspark.sql import functions as F

from miru_spark.corpus import generate_corpus
from miru_spark.index.compact import compact
from miru_spark.query.scorer import search_local
from miru_spark.streaming.ingest import ingest_stream, refresh


@pytest.fixture()
def streamed_index(spark, tmp_path):
    source = str(tmp_path / "arrivals")
    index_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(source)
    full = generate_corpus(spark, n_rows=240, seed=5, partitions=1).persist()
    rowidx = F.regexp_extract("path", r"f(\d+)\.", 1).cast("long")
    for i, (lo, hi) in enumerate([(0, 80), (80, 160), (160, 240)]):
        full.filter((rowidx >= lo) & (rowidx < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(source, f"wave_{i}"))
        q = ingest_stream(spark, os.path.join(source, "wave_*"), index_dir, ckpt,
                          partitions_per_batch=4)
        q.awaitTermination(120)
    refresh(spark, index_dir)
    return index_dir


def test_compaction_preserves_queries_and_docids(spark, streamed_index):
    idx = streamed_index
    queries = ["merge AND sort", "def", "merge OR sort", "def AND NOT license"]
    before = {q: search_local(idx, q, k=50) for q in queries}

    stats = compact(idx, target_docs=10_000)  # everything into one group
    assert stats["after_partitions"] < stats["before_partitions"]

    refresh(spark, idx)
    for q in queries:
        a, b = before[q], search_local(idx, q, k=50)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), q
        assert a["score"].tolist() == b["score"].tolist(), q
        assert a["path"].tolist() == b["path"].tolist(), q


def test_compaction_respects_target(spark, streamed_index):
    idx = streamed_index
    stats = compact(idx, target_docs=85)  # ~one wave per group
    assert stats["after_partitions"] <= stats["before_partitions"]
    assert stats["groups"] >= 3
    refresh(spark, idx)
    assert len(search_local(idx, "def", k=10)) == 10


def test_crash_mid_compaction_reconciles_forward(spark, streamed_index, monkeypatch):
    """Journaled swap: a crash right after the journal is written (staged
    files durable, nothing retired/published yet) leaves the ORIGINAL
    manifests fully consistent; reconcile() rolls the swap forward and the
    compacted index answers identically."""
    import miru_spark.index.compact as comp

    idx = streamed_index
    before = search_local(idx, "merge OR sort", k=50)
    man_dir = os.path.join(idx, "manifests")
    n_manifests_before = len([n for n in os.listdir(man_dir) if n.endswith(".json")])

    monkeypatch.setattr(comp, "_finish_swap", lambda *a, **k: None)  # crash here
    comp.compact(idx, target_docs=10_000)
    monkeypatch.undo()

    # crashed state: journal present, all original manifests intact
    journals = [n for n in os.listdir(man_dir) if n.endswith(".journal")]
    assert journals
    assert len([n for n in os.listdir(man_dir) if n.endswith(".json")]) == n_manifests_before
    # the staged files are _-prefixed → invisible to a merge scan; the index
    # still answers from the ORIGINAL segments
    refresh(spark, idx)  # merge reconciles: swap rolled forward
    assert not [n for n in os.listdir(man_dir) if n.endswith(".journal")]
    after = search_local(idx, "merge OR sort", k=50)
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    assert before["score"].tolist() == after["score"].tolist()


def test_assume_sorted_guard(spark, tmp_path):
    """assume_sorted on an input whose partition order does NOT follow key
    order must fail loudly instead of corrupting docIDs (ADVICE item)."""
    from miru_spark.index.build import build_index, check_assumed_sort, key_partition

    corpus = generate_corpus(spark, n_rows=120, seed=3, partitions=1)
    # a hash repartition scrambles key ranges across partitions
    scrambled = corpus.repartition(4)
    with pytest.raises(ValueError, match="assume_sorted violated"):
        build_index(
            spark, scrambled, str(tmp_path / "bad"), num_partitions=4,
            assume_sorted=True,
        )
    # the happy path still works: an in-plan range-partitioned input
    sorted_in_plan = (
        corpus.repartitionByRange(4, "repo", "path", "commit")
        .sortWithinPartitions("repo", "path", "commit")
    )
    check_assumed_sort(key_partition(sorted_in_plan, 4, assume_sorted=True))
