"""Scoped DataFrame caches that evict the previous generation.

Gate/bench operators cache small intermediate projections (per-doc tf
columns, minhash signatures, shingle posting lists) that the returned lazy
DataFrame still depends on — so they cannot unpersist before returning.
Left alone, every CALL leaks one cached relation for the session lifetime
(storage memory fills with dead partitions until LRU eviction starves the
caches still in use).

``scoped_cache(df, scope)`` caches ``df`` and unpersists whatever the SAME
scope cached before: by the time an operator is invoked again, the previous
invocation's consumers have run (and if one were somehow still pending,
unpersist only costs recomputation, never correctness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPES: dict[str, list[DataFrame]] = {}


def scoped_cache(df: DataFrame, scope: str) -> DataFrame:
    """Cache ``df``; release the cache the same ``scope`` made last time."""
    for old in _SCOPES.get(scope, []):
        try:
            old.unpersist()
        except Exception:
            pass  # session torn down between calls — nothing to release
    _SCOPES[scope] = [df]
    return df.cache()


def release_scope(scope: str) -> None:
    """Unpersist a scope's cache NOW. For operators that fully materialize
    their result driver-side before returning (a collect()ed measurement,
    never a lazy DataFrame that still depends on the cache) — leaving the
    cache to the next generation would pin it across unrelated operators."""
    for old in _SCOPES.pop(scope, []):
        try:
            old.unpersist()
        except Exception:
            pass
