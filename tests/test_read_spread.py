"""Split-gated read (the r4 verdict's one plan defect, fixed in r5).

`read_spread` must repartition ONLY when the parquet scan has fewer splits
than the cluster has slots. On a multi-split input the pipeline operators'
plans must contain NO round-robin Exchange — the corpus content column never
pays a shuffle before map work (stratified_split / mixture_resample /
decontaminate's probe side are map-only by design).
"""

from __future__ import annotations

import os

import pytest

from miru_spark.sources import read_spread


@pytest.fixture(scope="module")
def multisplit_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 documents + embeddings rewritten as >=16 parquet files each —
    a stand-in for a production table with thousands of splits."""
    out = str(tmp_path_factory.mktemp("multisplit"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(16).write.parquet(os.path.join(out, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.repartition(16).write.parquet(os.path.join(out, "embeddings.parquet"))
    return out


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_single_split_input_is_spread(spark, sf_dir):
    # the tiny bench file is one row group = one scan split; read_spread must
    # repartition it so tokenize work parallelizes
    df = read_spread(spark, os.path.join(sf_dir, "documents.parquet"))
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_multisplit_input_gets_bare_scan(spark, multisplit_dir):
    df = read_spread(spark, os.path.join(multisplit_dir, "documents.parquet"))
    assert "RoundRobinPartitioning" not in _plan(df)
    assert df.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


@pytest.mark.parametrize(
    "opname",
    ["stratified_split", "mixture_resample", "decontaminate", "token_counts"],
)
def test_pipeline_ops_no_roundrobin_exchange_on_multisplit(
    spark, multisplit_dir, opname
):
    """The verdict's Done criterion: explain() on a multi-split input shows
    no Exchange before the map stage (no RoundRobinPartitioning anywhere —
    the only exchanges left are the operators' own keyed aggregations)."""
    from miru_spark.pipeline import dedup as dd
    from miru_spark.pipeline import text as tx

    fn = getattr(tx, opname, None) or getattr(dd, opname)
    df = fn(spark, multisplit_dir)
    # token_counts collects internally and returns a local relation; its scan
    # plan is gone by then — assert on results being non-empty instead.
    if opname == "token_counts":
        assert df.count() > 0
        return
    plan = _plan(df)
    assert "RoundRobinPartitioning" not in plan, plan
    # sanity: results still produced
    assert df.count() > 0


def test_similarity_emb_no_roundrobin_on_multisplit(spark, multisplit_dir):
    from miru_spark.pipeline.similarity import cosine_topk_bruteforce

    df = cosine_topk_bruteforce(spark, multisplit_dir)
    assert "RoundRobinPartitioning" not in _plan(df)
    assert df.count() > 0
