"""Head-term salting (north rule: explicit skew handling): no merged shard
row may hold more than ~TARGET_POSTINGS_PER_SHARD postings, shards cover
contiguous docID ranges, and the assume_sorted fast path (no shuffle) yields
an equivalent index when the input is already key-sorted."""

import glob
import os

import pyarrow.parquet as pq
import pytest

import miru_spark.index.merge as merge_mod
from miru_spark.index.build import build_segments, key_partition
from miru_spark.index.merge import merge_segments
from miru_spark.query.scorer import search_local


def test_head_terms_are_sharded(spark, tiny_corpus, tmp_path, monkeypatch):
    """With a tiny shard target, head terms (df~140 over 8 partitions) must
    split into multiple shards, each within the bound and docID-contiguous."""
    monkeypatch.setattr(merge_mod, "TARGET_POSTINGS_PER_SHARD", 40)
    idx = str(tmp_path / "idx")
    keyed = key_partition(tiny_corpus, 8)
    build_segments(keyed, idx, resume=False).collect()
    merge_segments(spark, idx)

    rows = pq.read_table(os.path.join(idx, "merged")).to_pandas()
    head = rows[rows["term"] == "def"].sort_values("shard")
    assert len(head) > 1, "head term should have been salted into shards"
    # per-shard df bounded: ceil-division spans can at most double the target
    assert (head["df"] <= 2 * 40).all()
    # shards cover disjoint ascending docID ranges (block-max skipping stays valid)
    mins, maxs = head["min_doc"].tolist(), head["max_doc"].tolist()
    for i in range(1, len(head)):
        assert mins[i] > maxs[i - 1]
    # total df preserved
    assert head["df"].sum() == rows[rows["term"] == "def"]["df"].sum()

    # queries over the SHARDED index stay rank-identical to the oracle
    # (shard concatenation in load_postings + WAND over multi-run blocks)
    from miru_spark.index.build import assign_doc_ids
    from miru_spark.query.oracle import oracle_topk

    with_ids, _ = assign_doc_ids(tiny_corpus, 8)
    for q in ("def", "def AND license", "def OR merge", "def AND NOT sort"):
        got = search_local(idx, q, k=10)
        exp = oracle_topk(with_ids, q, k=10).toPandas()
        assert got["doc_id"].tolist() == exp["doc_id"].tolist(), q
        for g, e in zip(got["score"], exp["score"]):
            assert abs(float(g) - float(e)) <= 1e-9 * max(1.0, abs(float(e)))


def test_rare_terms_single_row(spark, tiny_index):
    rows = pq.read_table(os.path.join(tiny_index, "merged")).to_pandas()
    rare = rows[rows["term"] == "rareterm0"]
    assert len(rare) == 1 and int(rare["df"].iloc[0]) == 1


def test_assume_sorted_skips_shuffle_and_matches(spark, tiny_corpus, tmp_path):
    """Pre-sorting the corpus by key and building with assume_sorted=True
    (no range shuffle) must answer queries identically."""
    from miru_spark.index.build import build_index

    base = str(tmp_path / "shuffled")
    sortd = str(tmp_path / "sorted")
    build_index(spark, tiny_corpus, base, num_partitions=4, resume=False)

    pre = tiny_corpus.repartitionByRange(4, "repo", "path", "commit").sortWithinPartitions(
        "repo", "path", "commit"
    )
    build_index(spark, pre, sortd, num_partitions=4, resume=False, assume_sorted=True)
    for q in ("merge AND sort", "def OR license"):
        a = search_local(base, q, k=10)
        b = search_local(sortd, q, k=10)
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["score"].tolist() == b["score"].tolist()
