"""The hierarchical (fan-in bounded) merge must produce byte-identical
posting rows to the single-level merge — concatenation with first-varint
rewrite is associative."""

import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from miru_spark.index.build import build_segments, key_partition
from miru_spark.index.merge import merge_segments
from miru_spark.query.scorer import search_local


def _merged_rows(index_dir):
    frames = [
        pq.read_table(f).to_pandas()
        for f in sorted(glob.glob(os.path.join(index_dir, "merged", "*.parquet")))
    ]
    df = pd.concat(frames, ignore_index=True).sort_values(["term", "shard"]).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def two_indexes(spark, tiny_corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("hier")
    flat_dir = str(root / "flat")
    keyed = key_partition(tiny_corpus, 8)
    build_segments(keyed, flat_dir, resume=False).collect()
    hier_dir = str(root / "hier")
    shutil.copytree(flat_dir, hier_dir)
    merge_segments(spark, flat_dir)            # single level (8 runs/group)
    merge_segments(spark, hier_dir, fanin=2)   # 3 intermediate levels
    return flat_dir, hier_dir


def test_hierarchical_merge_is_byte_identical(two_indexes):
    flat, hier = two_indexes
    a, b = _merged_rows(flat), _merged_rows(hier)
    assert len(a) == len(b)
    for col in ("term", "shard", "df", "cf", "min_doc", "max_doc",
                "docids", "tfs", "block_last", "block_max_tf"):
        assert (a[col].values == b[col].values).all(), col


def test_hierarchical_merge_queries_identically(two_indexes):
    flat, hier = two_indexes
    for q in ("merge AND sort", "def OR license", "rare*"):
        ra = search_local(flat, q, k=10)
        rb = search_local(hier, q, k=10)
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist()
        assert ra["score"].tolist() == rb["score"].tolist()
