"""Source surface: where corpora come from.

- ``generate_corpus`` — deterministic synthetic source-code corpus (tests /
  bench; no external data).
- ``read_corpus`` — the production reader: parquet directory or Iceberg
  table of `(repo, path, commit, lang, content[, sha256])`.
- streaming arrival: ``miru_spark.streaming.ingest.ingest_stream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from miru_spark.corpus import CORPUS_SCHEMA, generate_corpus, verify_sha256  # noqa: F401


def read_corpus(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load the corpus table. ``fmt='iceberg'`` needs the Iceberg runtime on
    the cluster classpath (spark-submit --packages org.apache.iceberg:...);
    the sandbox ships parquet only."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)
