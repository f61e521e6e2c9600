"""dedup_incremental invariants: the per-source admission summary must
partition the batch exactly (exact + near + admitted == batch, per source),
and every batch doc whose text equals a base doc's text must land in
`exact` — the digest semi-join may not leak duplicates into admission.
Value-exactness vs the exhaustive (non-pigeonhole) oracle is the
`dedup_incremental` gate entry's job."""


def test_summary_partitions_the_batch(spark, sf_dir):
    from miru_spark.pipeline.dedup import dedup_incremental

    rows = dedup_incremental(spark, sf_dir).collect()
    assert rows, "batch split produced no sources"
    for r in rows:
        assert r["n_exact_dup"] + r["n_near_dup"] + r["n_admitted"] == r["n_batch"], r
        assert r["n_batch"] > 0


def test_exact_catches_every_cross_snapshot_duplicate(spark, sf_dir):
    from pyspark.sql import functions as F

    from miru_spark.pipeline.dedup import dedup_incremental

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base_texts = docs.filter(F.col("doc_id") % 10 != 0).select("text").distinct()
    want_exact = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .join(base_texts, "text", "left_semi")
        .count()
    )
    got_exact = sum(
        r["n_exact_dup"] for r in dedup_incremental(spark, sf_dir).collect()
    )
    assert got_exact == want_exact
