"""Shared top-k + rank helper (the TakeOrderedAndProject-preserving form).

One home for a trick-laden pattern previously duplicated in
operators/fulltext.py and pipeline/similarity.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def ranked_topk(df: DataFrame, k: int, id_col: str, *order_cols) -> DataFrame:
    """Top-k + dense 1..k rank WITHOUT a global single-partition window.

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject (per-partition
    heaps, driver merge of k rows — the plan that survives 100×); the rank is
    then a window over ONLY the k surviving rows. The partition key is
    ``id_col % 1`` — constant 0 but NOT foldable (null-propagating), so the
    optimizer can't strip it and WindowExec never sees an empty partition
    spec (a bare ``lit(1)`` IS stripped and still warns/single-partitions).

    Caveat (PLANS.md): do not stack further projections BETWEEN the limit
    and the window at call sites — CollapseProject can push them through the
    limit and break the TakeOrderedAndProject fusion."""
    top = df.orderBy(*order_cols).limit(k)
    w = Window.partitionBy(F.col(id_col) % 1).orderBy(*order_cols)
    return top.withColumn("rank", F.row_number().over(w))
